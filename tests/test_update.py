"""Unit tests for the decomposed MPPI update ops.

Mirrors the reference's TestController strategy: every sub-op checked against
hand-computed closed-form numpy expectations (reference: scripts/test.py:1362-1495,
test/test_controller.cpp:109-226).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mppi_tf_tpu.ops import update as upd
from mppi_tf_tpu.ops.noise import sample_noise, scale_noise
import jax


def softmax_expect(costs, lam, normalize=False):
    c = np.asarray(costs, np.float64)
    b = c.min()
    arg = c - b
    if normalize:
        arg = arg / arg.max()
    e = np.exp(-arg / lam)
    return b, arg, e, e.sum(), e / e.sum()


class TestUpdateChain:
    costs = np.array([1.0, 4.0, 0.5, 2.5, 100.0])
    lam = 1.5

    def test_beta(self):
        assert float(upd.beta(jnp.asarray(self.costs))) == 0.5

    def test_norm_arg(self):
        b = upd.beta(jnp.asarray(self.costs))
        got = upd.norm_arg(jnp.asarray(self.costs), b)
        np.testing.assert_allclose(got, self.costs - 0.5)

    def test_norm_arg_normalized(self):
        b = upd.beta(jnp.asarray(self.costs))
        got = upd.norm_arg(jnp.asarray(self.costs), b, normalize=True)
        np.testing.assert_allclose(got, (self.costs - 0.5) / 99.5)

    def test_exp_arg_exp_nabla_weights(self):
        _, arg, e, n, w = softmax_expect(self.costs, self.lam)
        b = upd.beta(jnp.asarray(self.costs))
        a = upd.norm_arg(jnp.asarray(self.costs), b)
        ea = upd.exp_arg(a, self.lam)
        np.testing.assert_allclose(ea, -arg / self.lam)
        ex = upd.exp(ea)
        np.testing.assert_allclose(ex, e, rtol=1e-12)
        nn = upd.nabla(ex)
        np.testing.assert_allclose(nn, n, rtol=1e-12)
        ww = upd.weights(ex, nn)
        np.testing.assert_allclose(ww, w, rtol=1e-12)
        assert abs(float(jnp.sum(ww)) - 1.0) < 1e-12

    def test_weighted_noise(self):
        rng = np.random.default_rng(0)
        k, tau, adim = 5, 3, 2
        noises = rng.normal(size=(k, tau, adim))
        _, _, _, _, w = softmax_expect(self.costs, self.lam)
        expect = np.einsum("k,kta->ta", w, noises)
        got = upd.weighted_noise(jnp.asarray(w), jnp.asarray(noises))
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_mppi_update_full_chain(self):
        rng = np.random.default_rng(1)
        k, tau, adim = 5, 4, 3
        noises = rng.normal(size=(k, tau, adim))
        _, _, _, _, w = softmax_expect(self.costs, self.lam)
        expect = np.einsum("k,kta->ta", w, noises)
        got = upd.mppi_update(
            jnp.asarray(self.costs), jnp.asarray(noises), self.lam
        )
        np.testing.assert_allclose(got, expect, rtol=1e-12)


class TestShiftNext:
    def test_get_next(self):
        useq = jnp.arange(12.0).reshape(6, 2)
        np.testing.assert_allclose(upd.get_next(useq, 1), [[0.0, 1.0]])
        np.testing.assert_allclose(
            upd.get_next(useq, 2), [[0.0, 1.0], [2.0, 3.0]]
        )

    def test_shift(self):
        useq = jnp.arange(12.0).reshape(6, 2)
        init = upd.init_zeros(1, 2, dtype=useq.dtype)
        shifted = upd.shift(useq, init, 1)
        expect = np.vstack([np.arange(2, 12).reshape(5, 2), [[0, 0]]])
        np.testing.assert_allclose(shifted, expect)

    def test_shift_length2(self):
        useq = jnp.arange(12.0).reshape(6, 2)
        init = jnp.full((2, 2), 7.0, dtype=useq.dtype)
        shifted = upd.shift(useq, init, 2)
        expect = np.vstack([np.arange(4, 12).reshape(4, 2), [[7, 7], [7, 7]]])
        np.testing.assert_allclose(shifted, expect)


class TestNoise:
    def test_scale_noise_matches_matmul(self):
        rng = np.random.default_rng(2)
        k, tau, adim = 4, 3, 3
        z = rng.normal(size=(k, tau, adim))
        sigma = np.array([[2.0, 0.5, 0.0], [0.0, 1.0, 0.0], [0.0, 0.3, 3.0]])
        ups = 1.7
        # reference semantics: eps[k,t] = (upsilon*sigma) @ z[k,t]
        # (controller_base.py:368)
        expect = np.einsum("ij,ktj->kti", ups * sigma, z)
        got = scale_noise(jnp.asarray(z), jnp.asarray(sigma), ups)
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_sample_noise_stats(self):
        key = jax.random.PRNGKey(0)
        sigma = np.diag([2.0, 0.5])
        eps = sample_noise(key, 20000, 4, 2, sigma, 1.0, dtype=jnp.float64)
        assert eps.shape == (20000, 4, 2)
        std = np.std(np.asarray(eps), axis=(0, 1))
        np.testing.assert_allclose(std, [2.0, 0.5], rtol=0.05)

    def test_sample_noise_deterministic_per_key(self):
        key = jax.random.PRNGKey(42)
        sigma = np.eye(2)
        a = sample_noise(key, 8, 3, 2, sigma)
        b = sample_noise(key, 8, 3, 2, sigma)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSoftmaxStabilityAtScale:
    """f32 update-law stability with huge costs (SURVEY.md §7 hard part:
    'exp/softmax stability at K=100k with f32')."""

    def test_update_no_nan_at_large_cost_scale(self):
        import jax.numpy as jnp
        import numpy as np

        from mppi_tf_tpu.ops import update as upd

        rng = np.random.RandomState(0)
        k, tau, adim = 4096, 10, 3
        costs = jnp.asarray(1e6 + 1e5 * rng.rand(k), jnp.float32)
        eps = jnp.asarray(rng.randn(k, tau, adim), jnp.float32)
        for normalize in (False, True):
            wn = upd.mppi_update(costs, eps, 0.8, normalize=normalize)
            assert np.all(np.isfinite(np.asarray(wn))), normalize
        # weights stay a simplex even when exp args would overflow raw f32
        b = upd.beta(costs)
        e = upd.exp(upd.exp_arg(upd.norm_arg(costs, b, normalize=False), 0.8))
        w = upd.weights(e, upd.nabla(e))
        np.testing.assert_allclose(float(jnp.sum(w)), 1.0, rtol=1e-5)

    def test_norm_arg_all_equal_costs_no_nan(self):
        """Regression (VERDICT r1 weak #4): all-equal costs make
        max(costs - beta) == 0; the normalize branch must not divide by it.
        Expected behavior matches the native core (mppi_core.cpp): denom
        falls back to 1, weights become uniform."""
        import jax.numpy as jnp
        import numpy as np

        from mppi_tf_tpu.ops import update as upd

        k, tau, adim = 64, 5, 3
        rng = np.random.RandomState(1)
        costs = jnp.full((k,), 42.0, jnp.float32)
        eps = jnp.asarray(rng.randn(k, tau, adim), jnp.float32)
        wn = upd.mppi_update(costs, eps, 0.8, normalize=True)
        assert np.all(np.isfinite(np.asarray(wn)))
        # uniform weights -> weighted noise is the plain mean
        np.testing.assert_allclose(np.asarray(wn),
                                   np.asarray(eps).mean(axis=0),
                                   rtol=1e-5, atol=1e-6)

"""Fused Pallas NN-dynamics kernel (kernels/nn_mppi.py) vs the XLA path.

Interpret mode with injected noise, SMALL hidden layers: interpret mode
lowers the in-kernel fori_loop MLP into one XLA op per scalar FMA, so the
reference 3x32 topology costs minutes of CPU compile per variant — the
parity property is topology-independent, so these tests pin it on an
(8, 8) network (the real 3x32 runs on TPU via Mosaic: bench rows
``auv_nn_mlp...pallas``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mppi_tf_tpu.controller.mppi import MPPI
from mppi_tf_tpu.costs import get_cost
from mppi_tf_tpu.kernels.errors import KernelUnsupportedError
from mppi_tf_tpu.kernels.nn_mppi import FusedNNMPPI, chunk_noise_nn
from mppi_tf_tpu.models.nn import NNAUVModel, NNAUVModelSpeed

pytestmark = pytest.mark.slow


def _family(hidden=(8, 8)):
    sigma = np.diag([50.0, 50.0, 50.0, 20.0, 20.0, 20.0])
    model = NNAUVModel(action_dim=6, dt=0.1, hidden=hidden, seed=4)
    goal = np.zeros(13)
    goal[2] = -2.0
    goal[6] = 1.0
    cost = get_cost(
        {"type": "static_quat", "diag": True, "goal": goal.tolist(),
         "Q": [10.0, 10.0, 10.0, 5.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]},
        lam=0.5, gamma=0.2, upsilon=1.2, sigma=sigma)
    return model, cost, sigma


def _mp_with_stats(model):
    """Params with non-trivial X/Y normalisation so the pack-time fold
    (W1' = W1/x_std, b1' = b1 - (x_mean/x_std)W1; Wn' = Wn*y_std,
    bn' = bn*y_std + y_mean) is actually exercised."""
    mp = model.init_params()
    return model.set_normalization(
        mp, 0.1 * np.arange(16), 1.0 + 0.05 * np.arange(16),
        0.01 * np.arange(13), 0.5 + 0.02 * np.arange(13))


@pytest.mark.parametrize("normalize", [False, True])
def test_fused_nn_matches_xla_path(normalize):
    k, tau, tile = 80, 3, 32  # partial last tile: lane masking
    model, cost, sigma = _family()
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2,
                sigma=sigma, normalize_cost=normalize)
    fused = FusedNNMPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2,
                        sigma=sigma, tile=tile, interpret=True)
    mp = _mp_with_stats(model)
    cp = cost.init_params()

    rng = np.random.RandomState(0)
    z_std = rng.randn(tau, 6, k).astype(np.float32)
    z = chunk_noise_nn(z_std, tile)
    eps = np.einsum("ij,tjk->kti", 1.2 * sigma, z_std)
    x0 = np.zeros(13)
    x0[6] = 1.0
    useq = (0.5 * rng.randn(tau, 6)).astype(np.float32)

    _, _, info = ctrl._solve_with_noise_jit(
        jnp.asarray(eps, ctrl._dtype), jnp.asarray(x0, ctrl._dtype),
        jnp.asarray(useq, ctrl._dtype), mp, cp)
    wn_ref = np.asarray(info["weighted_noise"])
    costs_ref = np.asarray(ctrl._rollout(
        jnp.asarray(x0, ctrl._dtype), jnp.asarray(useq, ctrl._dtype),
        jnp.asarray(eps, ctrl._dtype), mp, cp))

    wn, stats = fused.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                            use_prng=False, normalize=normalize)
    np.testing.assert_allclose(np.asarray(wn), wn_ref, rtol=2e-3,
                               atol=2e-4 * np.abs(wn_ref).max())
    np.testing.assert_allclose(float(stats["cost_min"]), costs_ref.min(),
                               rtol=2e-4)
    np.testing.assert_allclose(float(stats["cost_max"]), costs_ref.max(),
                               rtol=2e-4)
    assert np.isfinite(float(stats["nabla"]))


def test_weight_update_is_data_not_recompile():
    """The MBRL contract: a Learner weight update reaches the kernel as
    SMEM data — different result, same compiled executable."""
    from mppi_tf_tpu.kernels.nn_mppi import _fused_nn_call

    k, tau, tile = 64, 2, 32
    model, cost, sigma = _family()
    fused = FusedNNMPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2,
                        sigma=sigma, tile=tile, interpret=True)
    cp = cost.init_params()
    mp1 = _mp_with_stats(model)
    net2 = jax.tree.map(lambda w: w + 0.05, mp1["net"])
    mp2 = model.with_trainable(mp1, net2)
    rng = np.random.RandomState(2)
    z = jnp.asarray(chunk_noise_nn(
        rng.randn(tau, 6, k).astype(np.float32), tile))
    x0 = np.zeros(13)
    x0[6] = 1.0
    useq = np.zeros((tau, 6), np.float32)

    wn1, _ = fused.solve(0, x0, useq, mp1, cp, z=z, use_prng=False)
    n_compiled = _fused_nn_call._cache_size()
    wn2, _ = fused.solve(0, x0, useq, mp2, cp, z=z, use_prng=False)
    assert _fused_nn_call._cache_size() == n_compiled, \
        "weight update recompiled the fused NN solve"
    assert not np.allclose(np.asarray(wn1), np.asarray(wn2)), \
        "weight update did not reach the kernel"


def test_fused_nn_scheduled_matches_xla():
    k, tau, tile = 64, 3, 32
    model, cost, sigma = _family()
    c = np.linspace(1.0, 0.5, tau)
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2,
                sigma=sigma, noise_schedule=c)
    fused = FusedNNMPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2,
                        sigma=sigma, tile=tile, interpret=True, schedule=c)
    assert fused.scheduled
    mp = _mp_with_stats(model)
    cp = cost.init_params()
    rng = np.random.RandomState(5)
    z_std = rng.randn(tau, 6, k).astype(np.float32)
    z = chunk_noise_nn(z_std, tile)
    eps = np.einsum("ij,tjk->kti", 1.2 * sigma, z_std) * c[None, :, None]
    x0 = np.zeros(13)
    x0[6] = 1.0
    useq = (0.5 * rng.randn(tau, 6)).astype(np.float32)

    _, _, info = ctrl._solve_with_noise_jit(
        jnp.asarray(eps, ctrl._dtype), jnp.asarray(x0, ctrl._dtype),
        jnp.asarray(useq, ctrl._dtype), mp, cp, ctrl._sched)
    wn, _stats = fused.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                             use_prng=False)
    wn_ref = np.asarray(info["weighted_noise"])
    np.testing.assert_allclose(np.asarray(wn), wn_ref, rtol=2e-3,
                               atol=2e-4 * np.abs(wn_ref).max())


def test_eligibility():
    model, cost, sigma = _family()
    # the controller dispatch chain reaches FusedNNMPPI
    ctrl = MPPI(model, cost, k=64, tau=2, lam=0.5, upsilon=1.2,
                sigma=sigma, kernel="pallas", kernel_tile=32)
    assert type(ctrl._fused).__name__ == "FusedNNMPPI"

    # speed-variant model (analytic pose advance) is out of domain
    speed = NNAUVModelSpeed(action_dim=6, dt=0.1, hidden=(8, 8))
    with pytest.raises(KernelUnsupportedError):
        FusedNNMPPI(speed, cost, k=64, tau=2, lam=0.5, upsilon=1.2,
                    sigma=sigma, tile=32, interpret=True)
    # non-quat cost is out of domain
    pm_cost = get_cost({"type": "static", "diag": True,
                        "goal": [0.0] * 13, "Q": [1.0] * 13},
                       lam=0.5, gamma=0.2, upsilon=1.2, sigma=sigma)
    with pytest.raises(KernelUnsupportedError):
        FusedNNMPPI(model, pm_cost, k=64, tau=2, lam=0.5, upsilon=1.2,
                    sigma=sigma, tile=32, interpret=True)

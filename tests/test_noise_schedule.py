"""Per-step noise scheduling (sigma_t = c_t * sigma) across every path.

Greenfield feature (BASELINE.json configs[3] "long-horizon H=100 with noise
scheduling"; the reference draws one constant sigma over the horizon,
controller_base.py:348-369). Semantics under test:

- eps_t = c_t * (upsilon * sigma) @ z_t  (ops/noise.sample_noise);
- the action cost uses the matching per-step covariance Sigma_t = c_t *
  sigma, i.e. Sigma_t^-1 = Sigma^-1 / c_t (costs/base.action_cost) — the
  importance-sampling weights stay exact for the scheduled distribution;
- the fused Pallas kernels implement the same algebra with the c_t factors
  as SMEM runtime data (kernels/pm_mppi.py, kernels/auv_mppi.py): noise
  drive scaled by c_t, z-quadratic scaled by c_t, pure-action cost weighted
  by 1/c_t, the mixed rhs_z term schedule-invariant (c_t cancels), and the
  weighted-noise unfold applying c_t per step;
- a schedule of all ones is EXACTLY the unscheduled solve.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mppi_tf_tpu.controller.mppi import MPPI
from mppi_tf_tpu.costs import get_cost
from mppi_tf_tpu.models import get_model
from mppi_tf_tpu.ops.noise import (resolve_noise_schedule, sample_noise,
                                   sample_noise_antithetic)


# ---------------------------------------------------------------------------
# spec resolution
# ---------------------------------------------------------------------------

def test_resolve_specs():
    tau = 5
    assert resolve_noise_schedule(None, tau) is None
    np.testing.assert_allclose(
        resolve_noise_schedule([1, 2, 3, 4, 5], tau), [1, 2, 3, 4, 5])
    np.testing.assert_allclose(
        resolve_noise_schedule({"type": "constant", "value": 0.5}, tau),
        [0.5] * 5)
    lin = resolve_noise_schedule({"type": "linear", "start": 1.0,
                                  "end": 0.2}, tau)
    np.testing.assert_allclose(lin, np.linspace(1.0, 0.2, 5))
    geo = resolve_noise_schedule({"type": "exp", "start": 1.0,
                                  "end": 0.25}, tau)
    np.testing.assert_allclose(geo, np.geomspace(1.0, 0.25, 5))
    cos = resolve_noise_schedule({"type": "cosine", "start": 1.0,
                                  "end": 0.2}, tau)
    assert cos[0] == pytest.approx(1.0) and cos[-1] == pytest.approx(0.2)
    assert np.all(np.diff(cos) < 0)  # monotone anneal


def test_resolve_rejects_bad_specs():
    with pytest.raises(ValueError, match="length tau"):
        resolve_noise_schedule([1.0, 2.0], 5)
    with pytest.raises(ValueError, match="positive"):
        resolve_noise_schedule([1.0, 0.0, 1.0], 3)
    with pytest.raises(ValueError, match="positive"):
        resolve_noise_schedule({"type": "linear", "start": 1.0,
                                "end": -0.5}, 4)
    with pytest.raises(ValueError, match="unknown noise_schedule type"):
        resolve_noise_schedule({"type": "warble"}, 4)


# ---------------------------------------------------------------------------
# sampler
# ---------------------------------------------------------------------------

def test_sample_noise_schedule_scaling_exact():
    """Scheduled draw == unscheduled draw * c_t (same key, exact)."""
    key = jax.random.PRNGKey(0)
    sigma = jnp.asarray(np.diag([0.2, 0.4]), jnp.float32)
    c = np.linspace(1.0, 0.25, 7)
    eps0 = sample_noise(key, 64, 7, 2, sigma, upsilon=1.3)
    eps1 = sample_noise(key, 64, 7, 2, sigma, upsilon=1.3, schedule=c)
    np.testing.assert_array_equal(
        np.asarray(eps1),
        np.asarray(eps0) * c.astype(np.float32)[None, :, None])


def test_antithetic_pairing_survives_schedule():
    key = jax.random.PRNGKey(3)
    sigma = jnp.asarray(np.diag([0.2, 0.4]), jnp.float32)
    c = np.linspace(1.0, 0.25, 5)
    eps = np.asarray(sample_noise_antithetic(key, 64, 5, 2, sigma,
                                             schedule=c))
    np.testing.assert_array_equal(eps[32:], -eps[:32])


# ---------------------------------------------------------------------------
# XLA controller path
# ---------------------------------------------------------------------------

def _pm_setup(k, tau, lam=0.8, gamma=0.2, upsilon=1.2, **ctrl_kw):
    sigma = np.diag([0.25, 0.3, 0.2])
    model = get_model({"type": "point_mass", "mass": 1.3}, dt=0.1,
                      state_dim=6, action_dim=3)
    cost = get_cost(
        {"type": "static", "diag": True,
         "goal": [1.0, 0.0, 0.5, 0.0, -0.5, 0.0],
         "Q": [5.0, 1.0, 5.0, 1.0, 5.0, 1.0]},
        lam=lam, gamma=gamma, upsilon=upsilon, sigma=sigma,
    )
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=lam, upsilon=upsilon,
                sigma=sigma, **ctrl_kw)
    return ctrl, model, cost, sigma


def test_xla_ones_schedule_is_identity():
    """Injected-noise solve with c_t = 1 everywhere == unscheduled, exact."""
    k, tau = 128, 6
    ctrl, *_ = _pm_setup(k, tau)
    sched, *_ = _pm_setup(k, tau, noise_schedule=[1.0] * tau)
    rng = np.random.RandomState(0)
    eps = jnp.asarray(0.3 * rng.randn(k, tau, 3), ctrl._dtype)
    x0 = jnp.asarray(np.array([0.2, 0.0, -0.1, 0.0, 0.3, 0.0]),
                     ctrl._dtype)
    useq = jnp.asarray(0.1 * rng.randn(tau, 3), ctrl._dtype)
    a0, u0, _ = ctrl._solve_with_noise_jit(
        eps, x0, useq, ctrl.model_params, ctrl._cparams)
    a1, u1, _ = sched._solve_with_noise_jit(
        eps, x0, useq, sched.model_params, sched._cparams, sched._sched)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))


def test_xla_schedule_equals_manual_per_step_costs():
    """The scheduled rollout cost == hand-built per-step evaluation with
    Sigma_t = c_t * sigma (numpy oracle)."""
    k, tau = 16, 4
    ctrl, model, cost, sigma = _pm_setup(
        k, tau, noise_schedule={"type": "linear", "start": 1.0, "end": 0.4})
    c = np.asarray(ctrl._sched, np.float64)
    rng = np.random.RandomState(5)
    z = rng.randn(k, tau, 3)
    scale = ctrl._upsilon * np.asarray(sigma, np.float64)
    eps = np.einsum("ij,ktj->kti", scale, z) * c[None, :, None]
    x0 = np.array([0.2, 0.0, -0.1, 0.0, 0.3, 0.0])
    useq = 0.1 * rng.randn(tau, 3)

    costs = np.asarray(ctrl._rollout(
        jnp.asarray(x0, ctrl._dtype), jnp.asarray(useq, ctrl._dtype),
        jnp.asarray(eps, ctrl._dtype), ctrl.model_params, ctrl._cparams,
        ctrl._sched), np.float64)

    # numpy oracle: dynamics step + state cost + per-step action cost with
    # Sigma_t^-1 = Sigma^-1 / c_t (cost_base.py:114-170 algebra)
    A = np.asarray(model._A, np.float64)
    B = np.asarray(model._B, np.float64)
    m = float(np.asarray(ctrl.model_params["mass"]))
    Q = np.diag([5.0, 1.0, 5.0, 1.0, 5.0, 1.0])
    goal = np.array([1.0, 0.0, 0.5, 0.0, -0.5, 0.0])
    inv_sig = np.linalg.inv(np.asarray(sigma, np.float64))
    lam, gamma, ups = ctrl._lam, cost.gamma, ctrl._upsilon
    exp_costs = np.zeros(k)
    x = np.tile(x0, (k, 1))
    for t in range(tau):
        isig_t = inv_sig / c[t]
        u, e = useq[t], eps[:, t]
        x = x @ A.T + ((u[None] + e) / m) @ B.T
        d = x - goal
        state_c = np.einsum("ki,ij,kj->k", d, Q, d)
        a_c = 0.5 * (gamma * (u @ isig_t @ u + 2.0 * e @ isig_t @ u)
                     + lam * (1.0 - 1.0 / ups)
                     * np.einsum("ki,ij,kj->k", e, isig_t, e))
        exp_costs += state_c + a_c
    d = x - goal
    exp_costs += np.einsum("ki,ij,kj->k", d, Q, d)
    np.testing.assert_allclose(costs, exp_costs, rtol=1e-6)


# ---------------------------------------------------------------------------
# fused kernels (interpret mode, injected noise)
# ---------------------------------------------------------------------------

pytest_slow = pytest.mark.slow


@pytest_slow
@pytest.mark.parametrize("normalize", [False, True])
def test_fused_pm_scheduled_matches_xla(normalize):
    from mppi_tf_tpu.kernels.pm_mppi import FusedPointMassMPPI, chunk_noise

    k, tau, tile = 700, 7, 256  # partial last tile: lane masking
    sched_spec = {"type": "exp", "start": 1.0, "end": 0.3}
    ctrl, model, cost, sigma = _pm_setup(
        k, tau, noise_schedule=sched_spec, normalize_cost=normalize)
    c = np.asarray(ctrl._sched, np.float64)
    fused = FusedPointMassMPPI(model, cost, k=k, tau=tau, lam=0.8,
                               upsilon=1.2, sigma=sigma, tile=tile,
                               interpret=True, schedule=sched_spec)
    assert fused.scheduled
    mp, cp = ctrl.model_params, ctrl._cparams

    rng = np.random.RandomState(3)
    z_std = rng.randn(tau, 3, k).astype(np.float32)
    z = chunk_noise(z_std, tile)
    scale = (1.2 * sigma).astype(np.float64)
    eps = np.einsum("ij,tjk->kti", scale, z_std) * c[None, :, None]
    x0 = np.array([0.2, 0.0, -0.1, 0.0, 0.3, 0.0])
    useq = 0.1 * rng.randn(tau, 3).astype(np.float32)

    _, _, info = ctrl._solve_with_noise_jit(
        jnp.asarray(eps, ctrl._dtype), jnp.asarray(x0, ctrl._dtype),
        jnp.asarray(useq, ctrl._dtype), mp, cp, ctrl._sched)
    wn_ref = np.asarray(info["weighted_noise"])
    costs_ref = np.asarray(ctrl._rollout(
        jnp.asarray(x0, ctrl._dtype), jnp.asarray(useq, ctrl._dtype),
        jnp.asarray(eps, ctrl._dtype), mp, cp, ctrl._sched))

    wn, stats = fused.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                            use_prng=False, normalize=normalize)
    np.testing.assert_allclose(np.asarray(wn), wn_ref, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(stats["cost_min"]), costs_ref.min(),
                               rtol=2e-3)
    np.testing.assert_allclose(float(stats["cost_max"]), costs_ref.max(),
                               rtol=2e-3)

    # runtime schedule swap: same compiled kernel (SMEM data), new factors
    c2 = np.linspace(1.0, 0.5, tau)
    eps2 = np.einsum("ij,tjk->kti", scale, z_std) * c2[None, :, None]
    _, _, info2 = ctrl._solve_with_noise_jit(
        jnp.asarray(eps2, ctrl._dtype), jnp.asarray(x0, ctrl._dtype),
        jnp.asarray(useq, ctrl._dtype), mp, cp,
        jnp.asarray(c2, ctrl._dtype))
    wn2, _ = fused.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                         use_prng=False, normalize=normalize,
                         sched=jnp.asarray(c2, jnp.float32))
    np.testing.assert_allclose(np.asarray(wn2),
                               np.asarray(info2["weighted_noise"]),
                               rtol=2e-3, atol=2e-4)


@pytest_slow
def test_fused_lti_scheduled_matches_xla():
    """The dynamic-(A, B) kernel (DMD family) with a schedule: the SMEM
    noise drive is scaled by c_t on the dense smem_dot path too."""
    from mppi_tf_tpu.kernels.pm_mppi import FusedLTIMPPI, chunk_noise
    from mppi_tf_tpu.models.dmd import DMDModel

    k, tau, tile = 256, 5, 128
    sigma = np.diag([0.25, 0.3, 0.2])
    pm = get_model({"type": "point_mass", "mass": 1.3}, dt=0.1,
                   state_dim=6, action_dim=3)
    model = DMDModel(6, 3, dt=0.1, init_A=np.asarray(pm._A),
                     init_B=np.asarray(pm._B) / 1.3)
    cost = get_cost(
        {"type": "static", "diag": True,
         "goal": [1.0, 0.0, 0.5, 0.0, -0.5, 0.0],
         "Q": [5.0, 1.0, 5.0, 1.0, 5.0, 1.0]},
        lam=0.8, gamma=0.2, upsilon=1.2, sigma=sigma)
    c = np.geomspace(1.0, 0.4, tau)
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=0.8, upsilon=1.2,
                sigma=sigma, noise_schedule=c)
    fused = FusedLTIMPPI(model, cost, k=k, tau=tau, lam=0.8, upsilon=1.2,
                         sigma=sigma, tile=tile, interpret=True, schedule=c)
    mp, cp = ctrl.model_params, ctrl._cparams

    rng = np.random.RandomState(9)
    z_std = rng.randn(tau, 3, k).astype(np.float32)
    z = chunk_noise(z_std, tile)
    eps = np.einsum("ij,tjk->kti", 1.2 * sigma, z_std) * c[None, :, None]
    x0 = np.array([0.2, 0.0, -0.1, 0.0, 0.3, 0.0])
    useq = 0.1 * rng.randn(tau, 3).astype(np.float32)

    _, _, info = ctrl._solve_with_noise_jit(
        jnp.asarray(eps, ctrl._dtype), jnp.asarray(x0, ctrl._dtype),
        jnp.asarray(useq, ctrl._dtype), mp, cp, ctrl._sched)
    wn, _stats = fused.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                             use_prng=False)
    np.testing.assert_allclose(np.asarray(wn),
                               np.asarray(info["weighted_noise"]),
                               rtol=2e-3, atol=2e-4)


@pytest_slow
def test_fused_auv_scheduled_matches_xla():
    from tests.test_auv_kernel import _auv_cfg, _task

    from mppi_tf_tpu.kernels.auv_mppi import FusedAUVMPPI, chunk_noise_auv

    k, tau, tile = 80, 3, 32
    sigma = np.diag([40.0, 40.0, 40.0, 5.0, 5.0, 5.0])
    model = get_model(_auv_cfg(), dt=0.1, action_dim=6)
    cost = get_cost(_task(), lam=0.5, gamma=0.2, upsilon=1.2, sigma=sigma)
    c = np.linspace(1.0, 0.5, tau)
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2,
                sigma=sigma, noise_schedule=c)
    fused = FusedAUVMPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2,
                         sigma=sigma, tile=tile, interpret=True, schedule=c)
    assert fused.scheduled
    mp, cp = ctrl.model_params, ctrl._cparams

    rng = np.random.RandomState(0)
    z_std = rng.randn(tau, 6, k).astype(np.float32)
    z = chunk_noise_auv(z_std, tile)
    eps = np.einsum("ij,tjk->kti", 1.2 * sigma, z_std) * c[None, :, None]
    x0 = np.zeros(13)
    x0[6] = 1.0
    x0[2] = -1.0
    useq = (5.0 * rng.randn(tau, 6)).astype(np.float32)

    _, _, info = ctrl._solve_with_noise_jit(
        jnp.asarray(eps, ctrl._dtype), jnp.asarray(x0, ctrl._dtype),
        jnp.asarray(useq, ctrl._dtype), mp, cp, ctrl._sched)
    wn_ref = np.asarray(info["weighted_noise"])
    costs_ref = np.asarray(ctrl._rollout(
        jnp.asarray(x0, ctrl._dtype), jnp.asarray(useq, ctrl._dtype),
        jnp.asarray(eps, ctrl._dtype), ctrl._model.precompute(mp), cp,
        ctrl._sched))

    wn, stats = fused.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                            use_prng=False)
    np.testing.assert_allclose(np.asarray(wn), wn_ref, rtol=1e-2,
                               atol=1e-3 * np.abs(wn_ref).max())
    np.testing.assert_allclose(float(stats["cost_min"]), costs_ref.min(),
                               rtol=2e-4)
    np.testing.assert_allclose(float(stats["cost_max"]), costs_ref.max(),
                               rtol=2e-4)


# ---------------------------------------------------------------------------
# sharded + controller surface
# ---------------------------------------------------------------------------

def test_sharded_scheduled_matches_single_device():
    """ShardedMPPI(noise_schedule=) == single-device scheduled solve with
    the identical (schedule-scaled) injected noise."""
    from mppi_tf_tpu.parallel import make_mesh
    from mppi_tf_tpu.parallel.sharded import ShardedMPPI

    k, tau = 128, 5
    ctrl, model, cost, sigma = _pm_setup(
        k, tau, noise_schedule={"type": "linear", "start": 1.0, "end": 0.3})
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, ("k",))
    sctrl = ShardedMPPI(model, cost, mesh, k=k, tau=tau, lam=0.8,
                        upsilon=1.2, sigma=sigma,
                        noise_schedule={"type": "linear", "start": 1.0,
                                        "end": 0.3})
    c = np.asarray(ctrl._sched, np.float64)
    rng = np.random.RandomState(2)
    z = rng.randn(k, tau, 3)
    scale = 1.2 * np.asarray(sigma, np.float64)
    eps = np.einsum("ij,ktj->kti", scale, z) * c[None, :, None]
    x0 = np.array([0.2, 0.0, -0.1, 0.0, 0.3, 0.0])
    useq = 0.1 * rng.randn(tau, 3)

    a1, u1, _ = ctrl._solve_with_noise_jit(
        jnp.asarray(eps, ctrl._dtype), jnp.asarray(x0, ctrl._dtype),
        jnp.asarray(useq, ctrl._dtype), ctrl.model_params, ctrl._cparams,
        ctrl._sched)
    a2, u2, _ = sctrl._solve_with_noise(
        jnp.asarray(eps, sctrl._dtype), jnp.asarray(x0, sctrl._dtype),
        jnp.asarray(useq, sctrl._dtype), sctrl._mparams, sctrl._cparams)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-6)


def test_controller_set_noise_schedule():
    k, tau = 64, 4
    ctrl, *_ = _pm_setup(k, tau,
                         noise_schedule={"type": "constant", "value": 1.0})
    a0 = ctrl.next(np.zeros(6))
    ctrl.set_noise_schedule({"type": "linear", "start": 1.0, "end": 0.1})
    np.testing.assert_allclose(np.asarray(ctrl._sched),
                               np.linspace(1.0, 0.1, tau), rtol=1e-6)
    a1 = ctrl.next(np.zeros(6))
    assert a0.shape == a1.shape == (3,)

    plain, *_ = _pm_setup(k, tau)
    with pytest.raises(ValueError, match="without a noise_schedule"):
        plain.set_noise_schedule([1.0] * tau)


def test_factory_noise_schedule_key():
    """The env-config key `noise-schedule` reaches the controller."""
    from mppi_tf_tpu.controller import get_controller

    _, model, cost, sigma = _pm_setup(8, 3)
    cfg = {"samples": 8, "horizon": 3, "lambda": 0.8, "upsilon": 1.2,
           "noise": np.diag([0.25, 0.3, 0.2]).tolist(),
           "noise-schedule": {"type": "exp", "start": 1.0, "end": 0.5}}
    ctrl = get_controller(model, cost, cfg)
    assert ctrl._sched is not None
    np.testing.assert_allclose(np.asarray(ctrl._sched),
                               np.geomspace(1.0, 0.5, 3), rtol=1e-6)

"""Fused Pallas AUV kernel vs the XLA reference path (interpret mode).

Tiny shapes: the interpret-mode compile of the fully-unrolled scalar graph
is expensive, and the parity property is size-independent. The in-kernel
PRNG path is TPU-only and validated on hardware by the bench scripts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mppi_tf_tpu.controller.mppi import MPPI
from mppi_tf_tpu.costs import get_cost
from mppi_tf_tpu.kernels.auv_mppi import FusedAUVMPPI, chunk_noise_auv
from mppi_tf_tpu.models import get_model

# interpret-mode kernel parity: minutes-scale, excluded from the fast
# developer loop (pytest -m 'not slow'); the driver default runs all
pytestmark = pytest.mark.slow


def _auv_cfg():
    return {
        "type": "auv",
        "mass": 1862.87,
        "volume": 1.8121303501945525,
        "density": 1028.0,
        "cog": [0.0, 0.0, 0.0],
        "cob": [0.0, 0.0, 0.3],
        "Ma": (np.diag([779.79, 1222.0, 3659.9, 534.9, 842.69, 224.32])
               + 0.5).tolist(),
        "linear_damping": [-74.82, -69.48, -728.4, -268.8, -309.77, -105.0],
        "quad_damping": [-748.22, -992.53, -1821.01, -672.0, -774.44,
                         -523.27],
        "linear_damping_forward_speed": [0.0] * 6,
        "inertial": {"ixx": 525.39, "iyy": 794.2, "izz": 691.23,
                     "ixy": 1.44, "ixz": 33.41, "iyz": 2.6},
        "rk": 2,
    }


def _task():
    goal = np.zeros(13)
    goal[2] = -5.0
    goal[6] = 1.0
    return {"type": "static_quat", "diag": True, "goal": goal.tolist(),
            "Q": [100.0, 100.0, 100.0, 10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]}


def test_fused_auv_matches_xla_path():
    k, tau, tile = 80, 3, 32  # 80 = 2*32 + 16: exercises lane masking
    sigma = np.diag([40.0, 40.0, 40.0, 5.0, 5.0, 5.0])
    model = get_model(_auv_cfg(), dt=0.1, action_dim=6)
    cost = get_cost(_task(), lam=0.5, gamma=0.2, upsilon=1.2, sigma=sigma)
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2, sigma=sigma)
    mp, cp = ctrl.model_params, ctrl._cparams

    fused = FusedAUVMPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2,
                         sigma=sigma, tile=tile, interpret=True)

    rng = np.random.RandomState(0)
    z_std = rng.randn(tau, 6, k).astype(np.float32)
    z = chunk_noise_auv(z_std, tile)
    eps = np.einsum("ij,tjk->kti", 1.2 * sigma, z_std)
    x0 = np.zeros(13)
    x0[6] = 1.0
    x0[2] = -1.0
    useq = (5.0 * rng.randn(tau, 6)).astype(np.float32)

    _, _, info = ctrl._solve_with_noise_jit(
        jnp.asarray(eps, ctrl._dtype), jnp.asarray(x0, ctrl._dtype),
        jnp.asarray(useq, ctrl._dtype), mp, cp)
    wn_ref = np.asarray(info["weighted_noise"])
    costs_ref = np.asarray(ctrl._rollout(
        jnp.asarray(x0, ctrl._dtype), jnp.asarray(useq, ctrl._dtype),
        jnp.asarray(eps, ctrl._dtype), ctrl._model.precompute(mp), cp))

    wn, stats = fused.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                            use_prng=False)
    np.testing.assert_allclose(np.asarray(wn), wn_ref, rtol=1e-2,
                               atol=1e-3 * np.abs(wn_ref).max())
    np.testing.assert_allclose(float(stats["cost_min"]), costs_ref.min(),
                               rtol=2e-4)
    np.testing.assert_allclose(float(stats["cost_max"]), costs_ref.max(),
                               rtol=2e-4)
    np.testing.assert_allclose(float(stats["cost_mean"]), costs_ref.mean(),
                               rtol=2e-4)


def test_fused_auv_normalized_matches_xla_path():
    """Two-phase normalized AUV solve == XLA normalize_cost=True path."""
    k, tau, tile = 80, 3, 32
    sigma = np.diag([40.0, 40.0, 40.0, 5.0, 5.0, 5.0])
    model = get_model(_auv_cfg(), dt=0.1, action_dim=6)
    cost = get_cost(_task(), lam=0.5, gamma=0.2, upsilon=1.2, sigma=sigma)
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2, sigma=sigma,
                normalize_cost=True)
    mp, cp = ctrl.model_params, ctrl._cparams

    fused = FusedAUVMPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2,
                         sigma=sigma, tile=tile, interpret=True)

    rng = np.random.RandomState(7)
    z_std = rng.randn(tau, 6, k).astype(np.float32)
    z = chunk_noise_auv(z_std, tile)
    eps = np.einsum("ij,tjk->kti", 1.2 * sigma, z_std)
    x0 = np.zeros(13)
    x0[6] = 1.0
    x0[2] = -1.0
    useq = (5.0 * rng.randn(tau, 6)).astype(np.float32)

    _, _, info = ctrl._solve_with_noise_jit(
        jnp.asarray(eps, ctrl._dtype), jnp.asarray(x0, ctrl._dtype),
        jnp.asarray(useq, ctrl._dtype), mp, cp)
    wn_ref = np.asarray(info["weighted_noise"])

    wn, stats = fused.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                            use_prng=False, normalize=True)
    np.testing.assert_allclose(np.asarray(wn), wn_ref, rtol=1e-2,
                               atol=1e-3 * np.abs(wn_ref).max())
    assert np.isfinite(float(stats["nabla"]))


def test_fused_auv_waypoints_quat_matches_xla_path():
    """Fused AUV kernel with the quaternion waypoint mission cost == the
    XLA path — both with a 2-leg queue (runtime blend weights) and after a
    pop (single-goal regime), WITHOUT recompiling (the goals + blend ride
    the SMEM dyn array)."""
    from mppi_tf_tpu.costs import get_cost as _get_cost

    k, tau, tile = 80, 3, 32
    sigma = np.diag([40.0, 40.0, 40.0, 5.0, 5.0, 5.0])
    model = get_model(_auv_cfg(), dt=0.1, action_dim=6)
    w0 = np.zeros(13)
    w0[2], w0[6] = -5.0, 1.0
    w1 = np.zeros(13)
    w1[0], w1[2] = 3.0, -4.0
    w1[3], w1[6] = np.sin(0.3), np.cos(0.3)  # yawed attitude leg
    cost = _get_cost(
        {"type": "waypoints_quat", "diag": True,
         "Q": [100.0, 100.0, 100.0, 10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
         "waypoints": [w0.tolist(), w1.tolist()], "alpha": 0.3},
        lam=0.5, gamma=0.2, upsilon=1.2, sigma=sigma)
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2, sigma=sigma)
    mp, cp = ctrl.model_params, ctrl._cparams
    fused = FusedAUVMPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2,
                         sigma=sigma, tile=tile, interpret=True)

    rng = np.random.RandomState(11)
    z_std = rng.randn(tau, 6, k).astype(np.float32)
    z = chunk_noise_auv(z_std, tile)
    eps = np.einsum("ij,tjk->kti", 1.2 * sigma, z_std)
    x0 = np.zeros(13)
    x0[6], x0[2] = 1.0, -1.0
    useq = (5.0 * rng.randn(tau, 6)).astype(np.float32)

    for cparams in (cp, cost.pop(cp)):  # 2-leg blend, then single-goal
        _, _, info = ctrl._solve_with_noise_jit(
            jnp.asarray(eps, ctrl._dtype), jnp.asarray(x0, ctrl._dtype),
            jnp.asarray(useq, ctrl._dtype), mp, cparams)
        wn_ref = np.asarray(info["weighted_noise"])
        costs_ref = np.asarray(ctrl._rollout(
            jnp.asarray(x0, ctrl._dtype), jnp.asarray(useq, ctrl._dtype),
            jnp.asarray(eps, ctrl._dtype), ctrl._model.precompute(mp),
            cparams))
        wn, stats = fused.solve(0, x0, useq, mp, cparams,
                                z=jnp.asarray(z), use_prng=False)
        np.testing.assert_allclose(np.asarray(wn), wn_ref, rtol=1e-2,
                                   atol=1e-3 * np.abs(wn_ref).max())
        np.testing.assert_allclose(float(stats["cost_min"]),
                                   costs_ref.min(), rtol=2e-4)
        np.testing.assert_allclose(float(stats["cost_mean"]),
                                   costs_ref.mean(), rtol=2e-4)


def test_fused_auv_rejects_unsupported():
    sigma = np.diag([0.25, 0.3, 0.2])
    pm = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                   state_dim=6, action_dim=3)
    cost = get_cost({"type": "static", "diag": True,
                     "goal": [1.0, 0, 0, 0, 0, 0], "Q": [1.0] * 6},
                    lam=0.8, gamma=0.2, upsilon=1.0, sigma=sigma)
    with pytest.raises(TypeError):
        FusedAUVMPPI(pm, cost, k=64, tau=3, lam=0.8, upsilon=1.0,
                     sigma=sigma)


def test_fused_auv_elipse3d_matches_xla_path():
    """Fused AUV kernel with the 3D ellipse-tracking cost == the XLA path."""
    from mppi_tf_tpu.costs.elipse import ElipseCost3D

    k, tau, tile = 64, 2, 32
    sigma = np.diag([40.0, 40.0, 40.0, 5.0, 5.0, 5.0])
    model = get_model(_auv_cfg(), dt=0.1, action_dim=6)
    cost = ElipseCost3D(
        0.5, 0.2, 1.0, sigma,
        normal=[0.0, 0.0, 1.0], aVec=[1.0, 0.0, 0.0], axis=[3.0, 2.0],
        center=[0.5, -0.5, -4.0], speed=0.8, m_state=10.0, m_vel=1.0,
        dtype=model.dtype)
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.0, sigma=sigma)
    mp, cp = ctrl.model_params, ctrl._cparams
    fused = FusedAUVMPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.0,
                         sigma=sigma, tile=tile, interpret=True)

    rng = np.random.RandomState(4)
    z_std = rng.randn(tau, 6, k).astype(np.float32)
    z = chunk_noise_auv(z_std, tile)
    eps = np.einsum("ij,tjk->kti", 1.0 * sigma, z_std)
    x0 = np.zeros(13)
    x0[0], x0[2], x0[6] = 2.5, -4.0, 1.0
    useq = (5.0 * rng.randn(tau, 6)).astype(np.float32)

    _, _, info = ctrl._solve_with_noise_jit(
        jnp.asarray(eps, ctrl._dtype), jnp.asarray(x0, ctrl._dtype),
        jnp.asarray(useq, ctrl._dtype), mp, cp)
    wn_ref = np.asarray(info["weighted_noise"])
    costs_ref = np.asarray(ctrl._rollout(
        jnp.asarray(x0, ctrl._dtype), jnp.asarray(useq, ctrl._dtype),
        jnp.asarray(eps, ctrl._dtype), ctrl._model.precompute(mp), cp))

    wn, stats = fused.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                            use_prng=False)
    np.testing.assert_allclose(float(stats["cost_min"]), costs_ref.min(),
                               rtol=1e-3)
    np.testing.assert_allclose(float(stats["cost_mean"]), costs_ref.mean(),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(wn), wn_ref, rtol=1e-2,
                               atol=2e-3 * np.abs(wn_ref).max())

"""bf16 block-compute variant of the fused kernels (compute_dtype=
"bfloat16"): rollout FMA chains in bf16, cost accumulator + softmax +
Box-Muller in f32. A measured speed/accuracy option (VERDICT r4 next-step
#6); these tests pin the ACCURACY side on the interpret-mode kernels with
injected noise — the same solve at bf16 must stay close to the f32 kernel
(loose tolerance: bf16 carries ~3 significant digits through the
dynamics), and the plumbing (controller option, factory key, validation)
must be loud.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mppi_tf_tpu.controller.mppi import MPPI
from mppi_tf_tpu.costs import get_cost
from mppi_tf_tpu.kernels.pm_mppi import FusedPointMassMPPI, chunk_noise
from mppi_tf_tpu.models import get_model

pytestmark = pytest.mark.slow


def _pm_family():
    sigma = np.diag([0.25, 0.3, 0.2])
    model = get_model({"type": "point_mass", "mass": 1.3}, dt=0.1,
                      state_dim=6, action_dim=3)
    cost = get_cost(
        {"type": "static", "diag": True,
         "goal": [1.0, 0.0, 0.5, 0.0, -0.5, 0.0],
         "Q": [5.0, 1.0, 5.0, 1.0, 5.0, 1.0]},
        lam=0.8, gamma=0.2, upsilon=1.2, sigma=sigma)
    return model, cost, sigma


def test_bf16_pm_close_to_f32():
    # tiny shapes: interpret-mode bf16 emulation lowers a cast per op and
    # the XLA CPU compile of the unrolled kernel grows superlinearly
    k, tau, tile = 160, 3, 32
    model, cost, sigma = _pm_family()
    mk = lambda cd: FusedPointMassMPPI(
        model, cost, k=k, tau=tau, lam=0.8, upsilon=1.2, sigma=sigma,
        tile=tile, interpret=True, compute_dtype=cd)
    f32, bf16 = mk("float32"), mk("bfloat16")
    assert bf16.compute_dtype == "bfloat16"

    rng = np.random.RandomState(3)
    z = chunk_noise(rng.randn(tau, 3, k).astype(np.float32), tile)
    x0 = np.array([0.2, 0.0, -0.1, 0.0, 0.3, 0.0])
    useq = 0.1 * rng.randn(tau, 3).astype(np.float32)
    mp, cp = model.init_params(), cost.init_params()

    wn32, st32 = f32.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                           use_prng=False)
    wn16, st16 = bf16.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                            use_prng=False)
    # weighted noise: a softmax-weighted mean over 700 samples — bf16
    # per-sample cost error (~1%) perturbs weights, the mean stays close
    np.testing.assert_allclose(np.asarray(wn16), np.asarray(wn32),
                               rtol=0.2, atol=0.05 * float(
                                   np.abs(np.asarray(wn32)).max()))
    for key in ("cost_min", "cost_max", "cost_mean"):
        np.testing.assert_allclose(float(st16[key]), float(st32[key]),
                                   rtol=0.03)
    assert np.isfinite(float(st16["nabla"]))


def test_bf16_auv_runs_finite():
    """AUV at bf16: a SMOKE, not a tight parity — the measured verdict on
    this option is negative anyway (BF16_DECISION.json: slower than f32
    at every point because the (8, L) folded blocks violate bf16's
    native (16, 128) tiling, and the stiff Fossen dynamics lose ~2-3
    significant digits through rk2). The kernel must still run and
    produce finite, same-ballpark results; the tight-parity bar is the
    pm test above (LTI dynamics tolerate bf16)."""
    from tests.test_auv_kernel import _auv_cfg, _task

    from mppi_tf_tpu.kernels.auv_mppi import FusedAUVMPPI, chunk_noise_auv

    k, tau, tile = 80, 2, 32
    sigma = np.diag([40.0, 40.0, 40.0, 5.0, 5.0, 5.0])
    model = get_model(_auv_cfg(), dt=0.1, action_dim=6)
    cost = get_cost(_task(), lam=0.5, gamma=0.2, upsilon=1.2, sigma=sigma)
    mk = lambda cd: FusedAUVMPPI(
        model, cost, k=k, tau=tau, lam=0.5, upsilon=1.2, sigma=sigma,
        tile=tile, interpret=True, compute_dtype=cd)
    f32, bf16 = mk("float32"), mk("bfloat16")

    rng = np.random.RandomState(0)
    z = chunk_noise_auv(rng.randn(tau, 6, k).astype(np.float32), tile)
    x0 = np.zeros(13)
    x0[6] = 1.0
    x0[2] = -1.0
    useq = (5.0 * rng.randn(tau, 6)).astype(np.float32)
    mp, cp = model.init_params(), cost.init_params()

    wn32, st32 = f32.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                           use_prng=False)
    wn16, st16 = bf16.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                            use_prng=False)
    assert np.all(np.isfinite(np.asarray(wn16)))
    # same ballpark: cost stats within 10% (the f32-evaluated cost over
    # bf16-integrated states), weighted noise correlated with f32's
    for key in ("cost_min", "cost_max", "cost_mean"):
        np.testing.assert_allclose(float(st16[key]), float(st32[key]),
                                   rtol=0.1)
    a, b = np.asarray(wn16).ravel(), np.asarray(wn32).ravel()
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)
                                 + 1e-12))
    assert corr > 0.8, f"bf16 solution decorrelated from f32: {corr}"


def test_controller_kernel_dtype_plumbing():
    model, cost, sigma = _pm_family()
    ctrl = MPPI(model, cost, k=128, tau=3, lam=0.8, upsilon=1.2,
                sigma=sigma, kernel="pallas", kernel_tile=32,
                kernel_dtype="bfloat16")
    assert ctrl._fused.compute_dtype == "bfloat16"
    a = ctrl.next(np.zeros(6))  # interpret mode off-TPU: must run finite
    assert a.shape == (3,) and np.all(np.isfinite(a))

    with pytest.raises(ValueError, match="fused .*Pallas path only"):
        MPPI(model, cost, k=64, tau=5, lam=0.8, upsilon=1.2, sigma=sigma,
             kernel="xla", kernel_dtype="bfloat16")
    with pytest.raises(ValueError, match="float32.*bfloat16"):
        FusedPointMassMPPI(model, cost, k=64, tau=5, lam=0.8, upsilon=1.2,
                           sigma=sigma, tile=64, interpret=True,
                           compute_dtype="float16")


def test_bf16_composes_with_schedule_and_normalize():
    """bf16 + noise schedule + the two-phase normalized solve together."""
    k, tau, tile = 128, 3, 32
    model, cost, sigma = _pm_family()
    c = np.linspace(1.0, 0.4, tau)
    bf16 = FusedPointMassMPPI(model, cost, k=k, tau=tau, lam=0.8,
                              upsilon=1.2, sigma=sigma, tile=tile,
                              interpret=True, compute_dtype="bfloat16",
                              schedule=c)
    f32 = FusedPointMassMPPI(model, cost, k=k, tau=tau, lam=0.8,
                             upsilon=1.2, sigma=sigma, tile=tile,
                             interpret=True, schedule=c)
    rng = np.random.RandomState(5)
    z = chunk_noise(rng.randn(tau, 3, k).astype(np.float32), tile)
    x0 = np.array([0.2, 0.0, -0.1, 0.0, 0.3, 0.0])
    useq = 0.1 * rng.randn(tau, 3).astype(np.float32)
    mp, cp = model.init_params(), cost.init_params()
    wn32, st32 = f32.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                           use_prng=False, normalize=True)
    wn16, st = bf16.solve(0, x0, useq, mp, cp, z=jnp.asarray(z),
                          use_prng=False, normalize=True)
    # the NORMALIZED exponent amplifies bf16's ~1% per-sample cost error
    # into weight swings at k=128, so elementwise wnoise comparison is
    # meaningless here (the same near-argmax caveat as the TPU parity
    # notes) — compare the cost statistics tightly and the solution
    # direction loosely instead
    for key in ("cost_min", "cost_max", "cost_mean"):
        np.testing.assert_allclose(float(st[key]), float(st32[key]),
                                   rtol=0.03)
    a, b = np.asarray(wn16).ravel(), np.asarray(wn32).ravel()
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)
                                 + 1e-12))
    assert corr > 0.7, f"bf16 scheduled+normalized decorrelated: {corr}"
    assert np.isfinite(float(st["nabla"]))

"""Parity: native C++ MPPI core (f64 golden model) vs the JAX ops.

The cross-implementation check the reference ran between its Python and C++
suites by sharing hand-computed constants (scripts/test.py:1427-1468 ==
test/test_controller.cpp:109-167). Here the two implementations are compared
directly on random instances in float64, so any semantic drift between the
native core and ops/update.py + ops/rollout.py fails loudly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mppi_tf_tpu.controller.mppi import MPPI
from mppi_tf_tpu.costs import get_cost
from mppi_tf_tpu.models import get_model
from mppi_tf_tpu.ops import update as upd

native_core = pytest.importorskip("mppi_tf_tpu.native.core")

if not native_core.available():  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(7)
    k, tau, sdim, adim = 257, 12, 6, 3
    dt = 0.1
    mass = 1.7
    sigma = np.diag([0.25, 0.3, 0.2])
    model = get_model({"type": "point_mass", "mass": mass}, dt=dt,
                      state_dim=sdim, action_dim=adim, dtype=jnp.float64)
    goal = np.array([1.0, 0.0, 0.5, 0.0, -0.5, 0.0])
    Qd = np.array([5.0, 1.0, 5.0, 1.0, 5.0, 1.0])
    cost = get_cost({"type": "static", "diag": True, "goal": goal.tolist(),
                     "Q": Qd.tolist()},
                    lam=0.8, gamma=0.2, upsilon=1.3, sigma=sigma,
                    dtype=jnp.float64)
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=0.8, upsilon=1.3, sigma=sigma)
    eps = np.einsum("ij,ktj->kti", 1.3 * sigma, rng.randn(k, tau, adim))
    x0 = np.array([0.2, 0.0, -0.1, 0.0, 0.3, 0.0])
    useq = 0.1 * rng.randn(tau, adim)
    return dict(model=model, cost=cost, ctrl=ctrl, eps=eps, x0=x0, useq=useq,
                sigma=sigma, goal=goal, Q=np.diag(Qd), mass=mass)


def _native_args(p):
    model = p["model"]
    A = np.asarray(model._A, np.float64)
    Bm = np.asarray(model._B, np.float64) / p["mass"]
    inv_sigma = np.linalg.inv(p["sigma"])
    return A, Bm, p["x0"], p["useq"], p["eps"], p["Q"], p["goal"], inv_sigma


def test_rollout_costs_match(problem):
    p = problem
    ctrl = p["ctrl"]
    costs_jax = np.asarray(ctrl._rollout(
        jnp.asarray(p["x0"]), jnp.asarray(p["useq"]), jnp.asarray(p["eps"]),
        ctrl.model_params, ctrl._cparams))
    costs_nat = native_core.pm_rollout(*_native_args(p), lam=0.8, gamma=0.2,
                                       upsilon=1.3)
    np.testing.assert_allclose(costs_nat, costs_jax, rtol=1e-10)


@pytest.mark.parametrize("normalize", [False, True])
def test_update_matches(problem, normalize):
    p = problem
    rng = np.random.RandomState(1)
    costs = 10.0 + 5.0 * rng.rand(p["eps"].shape[0])
    wn_jax = np.asarray(upd.mppi_update(jnp.asarray(costs),
                                        jnp.asarray(p["eps"]), 0.8,
                                        normalize=normalize))
    wn_nat, stats = native_core.update(costs, p["eps"], lam=0.8,
                                       normalize=normalize)
    np.testing.assert_allclose(wn_nat, wn_jax, rtol=1e-12, atol=1e-14)
    assert stats["beta"] == pytest.approx(costs.min())


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_random_configs_match(trial):
    """Property-based parity: random problem instances (dims, temperature,
    gamma/upsilon, sigma, mass, dt, normalize) agree between the JAX solve
    and the native f64 golden core.

    Generalises the reference's single shared-constants cross-check
    (scripts/test.py:1427-1468 == test/test_controller.cpp:109-167) to a
    swept family of instances.
    """
    rng = np.random.RandomState(100 + trial)
    adim = int(rng.randint(1, 5))
    sdim = 2 * adim
    k = int(rng.randint(2, 400))
    tau = int(rng.randint(1, 30))
    dt = float(rng.uniform(0.01, 0.5))
    mass = float(rng.uniform(0.3, 20.0))
    lam = float(rng.uniform(0.05, 5.0))
    gamma = float(rng.uniform(0.0, 2.0))
    upsilon = float(rng.uniform(1.0, 3.0))
    normalize = bool(rng.randint(2))
    # random SPD, well-conditioned sigma
    Z = rng.randn(adim, adim)
    sigma = Z @ Z.T + adim * np.eye(adim)

    model = get_model({"type": "point_mass", "mass": mass}, dt=dt,
                      state_dim=sdim, action_dim=adim, dtype=jnp.float64)
    goal = rng.randn(sdim)
    Qd = rng.uniform(0.1, 10.0, size=sdim)
    cost = get_cost({"type": "static", "diag": True, "goal": goal.tolist(),
                     "Q": Qd.tolist()},
                    lam=lam, gamma=gamma, upsilon=upsilon, sigma=sigma,
                    dtype=jnp.float64)
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=lam, upsilon=upsilon,
                sigma=sigma, normalize_cost=normalize)
    eps = np.einsum("ij,ktj->kti", upsilon * sigma, rng.randn(k, tau, adim))
    x0 = rng.randn(sdim)
    useq = 0.3 * rng.randn(tau, adim)

    a_jax, useq_jax, _ = ctrl._solve_with_noise_jit(
        jnp.asarray(eps), jnp.asarray(x0), jnp.asarray(useq),
        ctrl.model_params, ctrl._cparams)
    A = np.asarray(model._A, np.float64)
    Bm = np.asarray(model._B, np.float64) / mass
    a_nat, useq_nat, stats = native_core.pm_solve(
        A, Bm, x0, useq, eps, np.diag(Qd), goal, np.linalg.inv(sigma),
        lam=lam, gamma=gamma, upsilon=upsilon, normalize=normalize)
    np.testing.assert_allclose(a_nat, np.asarray(a_jax), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(useq_nat, np.asarray(useq_jax), rtol=1e-8,
                               atol=1e-10)
    assert np.isfinite(stats["nabla"]) and stats["nabla"] > 0


def test_full_solve_matches_controller(problem):
    p = problem
    ctrl = p["ctrl"]
    a_jax, useq_jax, _ = ctrl._solve_with_noise_jit(
        jnp.asarray(p["eps"]), jnp.asarray(p["x0"]), jnp.asarray(p["useq"]),
        ctrl.model_params, ctrl._cparams)
    a_nat, useq_nat, stats = native_core.pm_solve(
        *_native_args(p), lam=0.8, gamma=0.2, upsilon=1.3)
    np.testing.assert_allclose(a_nat, np.asarray(a_jax), rtol=1e-10)
    np.testing.assert_allclose(useq_nat, np.asarray(useq_jax), rtol=1e-10,
                               atol=1e-12)
    assert stats["nabla"] > 0

"""DMDc model identification + DMD-MPPI online adaptation.

The reference reserves DMDMPPI as an empty subclass
(scripts/src/controllers/dmd_controller.py); here the capability is real:
DMDModel identifies a discrete linear model from transitions by
truncated-SVD least squares, and DMDMPPI refits it online through the
standard save(x, u, x_next) hook.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mppi_tf_tpu.controller.dmd import DMDMPPI
from mppi_tf_tpu.costs import get_cost
from mppi_tf_tpu.models import get_model
from mppi_tf_tpu.models.dmd import DMDModel
from mppi_tf_tpu.models.point_mass import PointMassModel


def _pm_truth(mass=1.3, dt=0.1, sdim=4, adim=2):
    """Ground-truth LTI plant and its exact (A, B)."""
    pm = PointMassModel(mass=mass, dt=dt, state_dim=sdim, action_dim=adim,
                        dtype=jnp.float64)
    A = np.asarray(pm._A, np.float64)
    B = np.asarray(pm._B, np.float64) / mass
    return pm, A, B


def _transitions(pm, n, sdim, adim, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, sdim)
    U = rng.randn(n, adim)
    Xn = np.asarray(pm.step(pm.init_params(), jnp.asarray(X), jnp.asarray(U)))
    return X, U, Xn


def test_dmdc_recovers_lti_exactly():
    """On noiseless LTI data DMDc is exact least squares: the identified
    (A, B) match the plant's block-diagonal A, B/mass to ~1e-9 (f64)."""
    sdim, adim = 4, 2
    pm, A_true, B_true = _pm_truth(sdim=sdim, adim=adim)
    X, U, Xn = _transitions(pm, 50, sdim, adim)

    dmd = DMDModel(state_dim=sdim, action_dim=adim, dtype=jnp.float64,
                   reg=0.0)
    params = dmd.fit(X, U, Xn)
    np.testing.assert_allclose(np.asarray(params["A"]), A_true, atol=1e-9)
    np.testing.assert_allclose(np.asarray(params["B"]), B_true, atol=1e-9)

    # and the fitted model predicts unseen transitions
    X2, U2, Xn2 = _transitions(pm, 10, sdim, adim, seed=1)
    pred = np.asarray(dmd.step(params, jnp.asarray(X2), jnp.asarray(U2)))
    np.testing.assert_allclose(pred, Xn2, atol=1e-8)


def test_dmdc_rank_truncation_is_noise_robust():
    """With measurement noise, the rank-truncated damped fit stays close to
    the true operator (the standard DMD conditioning control)."""
    sdim, adim = 4, 2
    pm, A_true, B_true = _pm_truth(sdim=sdim, adim=adim)
    X, U, Xn = _transitions(pm, 400, sdim, adim)
    rng = np.random.RandomState(3)
    Xn_noisy = Xn + 1e-3 * rng.randn(*Xn.shape)

    dmd = DMDModel(state_dim=sdim, action_dim=adim, dtype=jnp.float64,
                   rank=sdim + adim, reg=1e-8)
    params = dmd.fit(X, U, Xn_noisy)
    assert np.max(np.abs(np.asarray(params["A"]) - A_true)) < 1e-3
    assert np.max(np.abs(np.asarray(params["B"]) - B_true)) < 1e-3


def test_dmd_model_validation_and_factory():
    dmd = get_model({"type": "dmd", "rank": 3, "reg": 1e-6}, dt=0.1,
                    state_dim=4, action_dim=2)
    assert isinstance(dmd, DMDModel)
    p = dmd.init_params()
    # identity-A / zero-B prior before the first fit
    np.testing.assert_allclose(np.asarray(p["A"]), np.eye(4))
    np.testing.assert_allclose(np.asarray(p["B"]), 0.0)
    with pytest.raises(ValueError, match="rank"):
        DMDModel(state_dim=4, action_dim=2, rank=7)
    with pytest.raises(ValueError, match="X must be"):
        dmd.fit(np.zeros((5, 3)), np.zeros((5, 2)), np.zeros((5, 3)))
    with pytest.raises(ValueError, match="Xn"):
        dmd.fit(np.zeros((5, 4)), np.zeros((5, 2)), np.zeros((6, 4)))


def test_dmd_mppi_online_adaptation_reaches_goal():
    """Closed loop on the true LTI plant: DMDMPPI starts from the identity
    prior (useless for control), identifies the plant from exploration
    transitions fed through save(), then drives the state to the goal."""
    sdim, adim = 4, 2
    mass, dt = 1.3, 0.1
    pm, _, _ = _pm_truth(mass=mass, dt=dt, sdim=sdim, adim=adim)
    pm_params = pm.init_params()

    sigma = np.diag([0.4, 0.4])
    goal = [1.0, 0.0, -0.5, 0.0]
    cost = get_cost({"type": "static", "diag": True, "goal": goal,
                     "Q": [6.0, 0.4, 6.0, 0.4]},
                    lam=0.4, gamma=0.1, upsilon=1.0, sigma=sigma)
    dmd = DMDModel(state_dim=sdim, action_dim=adim, dtype=jnp.float64,
                   reg=1e-10)
    ctrl = DMDMPPI(dmd, cost, k=600, tau=20, lam=0.4, upsilon=1.0,
                   sigma=sigma, seed=4, refit_every=5)

    # exploration: random actions on the real plant, fed through save()
    rng = np.random.RandomState(7)
    x = np.zeros(sdim)
    for _ in range(30):
        u = rng.uniform(-1.0, 1.0, size=adim)
        xn = np.asarray(pm.predict(pm_params, jnp.asarray(x), jnp.asarray(u)))
        ctrl.save(x, u, xn)
        x = xn
    assert ctrl.n_fits >= 1
    # the online fit recovered the plant
    np.testing.assert_allclose(np.asarray(ctrl.model_params["A"]),
                               np.asarray(pm._A), atol=1e-6)

    # control: closed loop on the true plant with the identified model
    x = np.zeros(sdim)
    d0 = np.linalg.norm(x[[0, 2]] - np.asarray(goal)[[0, 2]])
    for _ in range(60):
        u = ctrl.next(x)
        xn = np.asarray(pm.predict(pm_params, jnp.asarray(x),
                                   jnp.asarray(u)))
        ctrl.save(x, u, xn)  # keep refits exercised mid-run
        x = xn
    d = np.linalg.norm(x[[0, 2]] - np.asarray(goal)[[0, 2]])
    assert d < 0.15, f"goal distance {d} (initial {d0})"
    assert d < 0.25 * d0


def test_fit_from_buffer_pads_to_static_shape():
    """Regression (code review): fit_from_buffer zero-pads the snapshot to
    the buffer CAPACITY (one XLA executable across fill levels); zero rows
    are exact no-ops for the least squares, so the padded fit equals the
    unpadded fit."""
    from mppi_tf_tpu.learning.replay import ReplayBuffer

    sdim, adim = 4, 2
    pm, A_true, B_true = _pm_truth(sdim=sdim, adim=adim)
    X, U, Xn = _transitions(pm, 37, sdim, adim)
    rb = ReplayBuffer(128, sdim, adim)
    for i in range(37):
        rb.add(X[i], U[i], Xn[i])

    dmd = DMDModel(state_dim=sdim, action_dim=adim, dtype=jnp.float64,
                   reg=1e-12)
    p_pad = dmd.fit_from_buffer(rb)
    p_raw = dmd.fit(X, U, Xn)
    np.testing.assert_allclose(np.asarray(p_pad["A"]),
                               np.asarray(p_raw["A"]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(p_pad["B"]),
                               np.asarray(p_raw["B"]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(p_pad["A"]), A_true, atol=1e-7)


def test_learner_trains_dmd_model_by_gradient():
    """DMDModel also plugs into the Learner's analytic-model path (state-MSE
    through step, the reference's per-model Adam handle): gradient training
    refines (A, B) from the identity prior."""
    from mppi_tf_tpu.learning import Learner

    sdim, adim = 4, 2
    pm, A_true, B_true = _pm_truth(sdim=sdim, adim=adim)
    X, U, Xn = _transitions(pm, 64, sdim, adim)

    dmd = DMDModel(state_dim=sdim, action_dim=adim, dtype=jnp.float64)
    learner = Learner(dmd, buffer_size=128, num_epochs=400,
                      learning_rate=5e-2)
    for i in range(64):
        learner.add_rb(X[i].reshape(-1, 1), U[i].reshape(-1, 1),
                       Xn[i].reshape(-1, 1))
    Xp, Yp = learner._prepare(learner.rb_trans())
    loss0 = float(learner._loss(dmd.trainable(learner.params), Xp, Yp))
    loss = learner.train_all(augment=False)
    assert loss < 0.05 * loss0, (loss, loss0)


def test_dmd_mppi_checkpoint_resume(tmp_path):
    """save_state/load_state round-trips the identification state: the
    identified (A, B), the replay window, and the save/fit counters, so a
    resumed controller keeps refitting where it left off."""
    sdim, adim = 4, 2
    pm, _, _ = _pm_truth(sdim=sdim, adim=adim)
    pp = pm.init_params()
    sigma = np.diag([0.4, 0.4])
    cost = get_cost({"type": "static", "diag": True,
                     "goal": [1.0, 0.0, -0.5, 0.0],
                     "Q": [6.0, 0.4, 6.0, 0.4]},
                    lam=0.4, gamma=0.1, upsilon=1.0, sigma=sigma)

    def mk():
        dmd = DMDModel(state_dim=sdim, action_dim=adim, dtype=jnp.float64,
                       reg=1e-10)
        return DMDMPPI(dmd, cost, k=64, tau=8, lam=0.4, upsilon=1.0,
                       sigma=sigma, seed=4, refit_every=5)

    a = mk()
    rng = np.random.RandomState(7)
    x = np.zeros(sdim)
    for _ in range(17):
        u = rng.uniform(-1.0, 1.0, size=adim)
        xn = np.asarray(pm.predict(pp, jnp.asarray(x), jnp.asarray(u)))
        a.save(x, u, xn)
        x = xn
    path = str(tmp_path / "dmd_ckpt.npz")
    a.save_state(path)

    b = mk()
    b.load_state(path)
    assert b.n_fits == a.n_fits and b._saves == a._saves
    assert len(b.replay) == len(a.replay)
    np.testing.assert_allclose(np.asarray(b.model_params["A"]),
                               np.asarray(a.model_params["A"]))
    # identical behavior after resume: next refit fires at the same save
    for ctrl in (a, b):
        u = np.array([0.1, -0.2])
        xn = np.asarray(pm.predict(pp, jnp.asarray(x), jnp.asarray(u)))
        for _ in range(3):
            ctrl.save(x, u, xn)
    assert b.n_fits == a.n_fits
    np.testing.assert_allclose(np.asarray(b.model_params["A"]),
                               np.asarray(a.model_params["A"]))
    np.testing.assert_allclose(np.asarray(b.next(x)), np.asarray(a.next(x)))


def test_factory_and_runner_build_adaptive_dmd_controller():
    """get_controller returns DMDMPPI for a DMD model (the CLI route), and
    the standard closed-loop runner's save() hook then identifies the plant
    online: a config-driven experiment with `type: dmd` converges."""
    from mppi_tf_tpu.controller import get_controller
    from mppi_tf_tpu.envs.runner import run_experiment

    sigma = np.diag([0.4, 0.4])
    env_cfg = {"env": "analytic:point_mass", "state-dim": 4,
               "action-dim": 2, "dt": 0.1, "noise": sigma.tolist(),
               "lambda": 0.4, "gamma": 0.1, "upsilon": 1.0,
               "samples": 400, "horizon": 15, "refit-every": 5}
    task_cfg = {"type": "static", "diag": True,
                "goal": [1.0, 0.0, -0.5, 0.0], "Q": [6.0, 0.4, 6.0, 0.4]}
    model_cfg = {"type": "dmd", "reg": 1e-9}

    cost = get_cost(task_cfg, lam=0.4, gamma=0.1, upsilon=1.0, sigma=sigma)
    dmd = get_model(model_cfg, dt=0.1, state_dim=4, action_dim=2)
    ctrl = get_controller(dmd, cost, env_cfg)
    assert isinstance(ctrl, DMDMPPI)
    assert ctrl._refit_every == 5

    # explicit overrides beat config keys, like every other option
    ctrl2 = get_controller(dmd, cost, env_cfg, refit_every=2)
    assert ctrl2._refit_every == 2

    # the mesh path builds the ADAPTIVE sharded controller (round-2 item:
    # a sharded DMD no longer needs the pre-fit workaround — the save()
    # hook refits, the sharded solve never retraces)
    from mppi_tf_tpu.controller.dmd import ShardedDMDMPPI
    from mppi_tf_tpu.parallel import make_mesh

    sctrl = get_controller(dmd, cost, dict(env_cfg, samples=400),
                           mesh=make_mesh(8, ("k",)))
    assert isinstance(sctrl, ShardedDMDMPPI)
    assert sctrl._refit_every == 5

    res = run_experiment(env_cfg, task_cfg, model_cfg, steps=80, seed=3)
    assert res["controller"].n_fits >= 1
    final = res["states"][-1]
    # DMD identifies the plant from the closed-loop transitions on the
    # fly (identity-prior start), then controls it
    err = np.linalg.norm(final[[0, 2]] - np.array([1.0, -0.5]))
    assert err < 0.3, err


def test_prefit_dmd_runs_sharded():
    """Pre-fit route: fit (A, B) offline, install them via model_params,
    and run the identified linear model K-sharded on the 8-device mesh —
    matching the true-plant controller's solve."""
    from mppi_tf_tpu.parallel import ShardedMPPI, make_mesh

    sdim, adim = 4, 2
    pm, _, _ = _pm_truth(sdim=sdim, adim=adim)
    X, U, Xn = _transitions(pm, 64, sdim, adim)
    dmd = DMDModel(state_dim=sdim, action_dim=adim, dtype=jnp.float64,
                   reg=0.0)
    fitted = dmd.fit(X, U, Xn)

    sigma = np.diag([0.4, 0.4])
    cost = get_cost({"type": "static", "diag": True,
                     "goal": [1.0, 0.0, -0.5, 0.0],
                     "Q": [6.0, 0.4, 6.0, 0.4]},
                    lam=0.4, gamma=0.1, upsilon=1.0, sigma=sigma)
    mesh = make_mesh(8, ("k",))
    ctrl = ShardedMPPI(dmd, cost, mesh, k=256, tau=10, lam=0.4,
                       upsilon=1.0, sigma=sigma, seed=5)
    ctrl.model_params = fitted
    truth = ShardedMPPI(pm, cost, mesh, k=256, tau=10, lam=0.4,
                        upsilon=1.0, sigma=sigma, seed=5)
    x = np.array([0.2, 0.0, -0.3, 0.0])
    a_dmd = ctrl.next(x)
    a_true = truth.next(x)
    # exact LTI identification -> same rollouts -> same action (same seed)
    np.testing.assert_allclose(a_dmd, a_true, rtol=1e-8, atol=1e-10)


def test_dmd_mppi_guards():
    sigma = np.diag([0.4, 0.4])
    cost = get_cost({"type": "static", "diag": True,
                     "goal": [1.0, 0.0, -0.5, 0.0],
                     "Q": [6.0, 0.4, 6.0, 0.4]},
                    lam=0.4, gamma=0.1, upsilon=1.0, sigma=sigma)
    pm = PointMassModel(mass=1.0, dt=0.1, state_dim=4, action_dim=2)
    with pytest.raises(TypeError, match="DMDModel"):
        DMDMPPI(pm, cost, k=8, tau=3, lam=0.4, upsilon=1.0, sigma=sigma)
    dmd = DMDModel(state_dim=4, action_dim=2)
    ctrl = DMDMPPI(dmd, cost, k=8, tau=3, lam=0.4, upsilon=1.0, sigma=sigma)
    with pytest.raises(ValueError, match="min_samples"):
        ctrl.fit_now()


def test_sharded_adaptive_dmd_closed_loop():
    """ShardedDMDMPPI (8-device mesh, XLA path): the save() hook refits the
    sharded controller online — no pre-fit workaround — and the closed loop
    reaches the goal from the identity prior."""
    from mppi_tf_tpu.controller.dmd import ShardedDMDMPPI
    from mppi_tf_tpu.parallel import make_mesh

    sdim, adim = 4, 2
    pm, _, _ = _pm_truth(sdim=sdim, adim=adim)
    pm_params = pm.init_params()
    sigma = np.diag([0.4, 0.4])
    goal = [1.0, 0.0, -0.5, 0.0]
    cost = get_cost({"type": "static", "diag": True, "goal": goal,
                     "Q": [6.0, 0.4, 6.0, 0.4]},
                    lam=0.4, gamma=0.1, upsilon=1.0, sigma=sigma)
    dmd = DMDModel(state_dim=sdim, action_dim=adim, dtype=jnp.float64,
                   reg=1e-10)
    ctrl = ShardedDMDMPPI(dmd, cost, make_mesh(8, ("k",)), k=320, tau=15,
                          lam=0.4, upsilon=1.0, sigma=sigma, seed=4,
                          refit_every=5)

    rng = np.random.RandomState(7)
    x = np.zeros(sdim)
    for _ in range(30):
        u = rng.uniform(-1.0, 1.0, size=adim)
        xn = np.asarray(pm.predict(pm_params, jnp.asarray(x), jnp.asarray(u)))
        ctrl.save(x, u, xn)
        x = xn
    assert ctrl.n_fits >= 1
    np.testing.assert_allclose(np.asarray(ctrl.model_params["A"]),
                               np.asarray(pm._A), atol=1e-6)

    x = np.zeros(sdim)
    d0 = np.linalg.norm(x[[0, 2]] - np.asarray(goal)[[0, 2]])
    for _ in range(50):
        u = ctrl.next(x)
        xn = np.asarray(pm.predict(pm_params, jnp.asarray(x),
                                   jnp.asarray(u)))
        ctrl.save(x, u, xn)
        x = xn
    d = np.linalg.norm(x[[0, 2]] - np.asarray(goal)[[0, 2]])
    assert d < 0.15, f"goal distance {d} (initial {d0})"


def test_fused_lti_dmd_refit_never_recompiles():
    """DMDMPPI(kernel='pallas') runs the dynamic-(A, B) FusedLTIMPPI kernel:
    a refit changes only the SMEM data, so the jitted fused step is NOT
    retraced (one executable across refits — round-2 item 3)."""
    from mppi_tf_tpu.kernels.pm_mppi import FusedLTIMPPI

    sdim, adim = 4, 2
    pm = PointMassModel(mass=1.3, dt=0.1, state_dim=sdim, action_dim=adim,
                        dtype=jnp.float32)
    pm_params = pm.init_params()
    sigma = np.diag([0.4, 0.4])
    cost = get_cost({"type": "static", "diag": True,
                     "goal": [1.0, 0.0, -0.5, 0.0],
                     "Q": [6.0, 0.4, 6.0, 0.4]},
                    lam=0.4, gamma=0.1, upsilon=1.0, sigma=sigma)
    dmd = DMDModel(state_dim=sdim, action_dim=adim, dtype=jnp.float32,
                   reg=1e-8)
    ctrl = DMDMPPI(dmd, cost, k=64, tau=4, lam=0.4, upsilon=1.0,
                   sigma=sigma, seed=0, refit_every=5,
                   kernel="pallas", kernel_tile=64)
    assert isinstance(ctrl._fused, FusedLTIMPPI)

    x = np.zeros(sdim)
    ctrl.next(x)  # compile once
    n_compiled = ctrl._fused_step_jit._cache_size()
    assert n_compiled >= 1

    rng = np.random.RandomState(1)
    for _ in range(21):  # min_samples=2*(s+a)=12, refit_every=5 -> 2 fits
        u = rng.uniform(-1.0, 1.0, size=adim)
        xn = np.asarray(pm.predict(pm_params, jnp.asarray(x, jnp.float32),
                                   jnp.asarray(u, jnp.float32)))
        ctrl.save(x, u, xn)
        x = xn
    assert ctrl.n_fits >= 2  # (A, B) changed at least twice
    ctrl.next(x)
    assert ctrl._fused_step_jit._cache_size() == n_compiled

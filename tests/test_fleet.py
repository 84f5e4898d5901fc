"""FleetMPPI: one compiled dispatch replans N vehicles (controller/fleet.py).

Greenfield surface (no reference counterpart — the reference drives one
controller per process, scripts/main.py:94-106). The contract: per-vehicle
results are EXACTLY what n independent single-vehicle MPPI controllers
would produce given the same PRNG keys, and the fleet-axis sharding over
the 8-device virtual mesh changes nothing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mppi_tf_tpu.controller import FleetMPPI, MPPI
from mppi_tf_tpu.costs import get_cost
from mppi_tf_tpu.models import get_model


def _family(lam=0.6, gamma=0.2, upsilon=1.0):
    sigma = np.diag([0.4, 0.4])
    model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                      state_dim=4, action_dim=2)
    cost = get_cost({"type": "static", "diag": True,
                     "goal": [1.0, 0.0, -0.5, 0.0],
                     "Q": [8.0, 1.5, 8.0, 1.5]},
                    lam=lam, gamma=gamma, upsilon=upsilon, sigma=sigma)
    return model, cost, sigma


def test_fleet_matches_independent_controllers():
    """The vmapped fleet step == n independent MPPI.next calls when seeded
    with the same per-vehicle keys (same split order, same solve)."""
    model, cost, sigma = _family()
    n, k, tau = 3, 64, 6
    goals = np.array([[1.0, 0.0, -0.5, 0.0],
                      [-0.8, 0.0, 0.3, 0.0],
                      [0.2, 0.0, 1.1, 0.0]])
    fleet = FleetMPPI(model, cost, n_vehicles=n, k=k, tau=tau, lam=0.6,
                      upsilon=1.0, sigma=sigma, goals=goals, seed=4)

    singles = []
    for i in range(n):
        c = MPPI(model, cost, k=k, tau=tau, lam=0.6, upsilon=1.0,
                 sigma=sigma, seed=0)
        c._key = fleet._keys[i]  # identical per-vehicle streams
        c.set_goal(goals[i])
        singles.append(c)

    rng = np.random.default_rng(0)
    states = rng.normal(size=(n, 4))
    for _ in range(3):  # several steps: keys AND useq must stay in lockstep
        a_fleet = fleet.next(states)
        a_single = np.stack([c.next(states[i])
                             for i, c in enumerate(singles)])
        np.testing.assert_allclose(a_fleet, a_single, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(fleet.useq),
            np.stack([np.asarray(c.useq) for c in singles]),
            rtol=1e-5, atol=1e-7)


def test_fleet_closed_loop_distinct_goals():
    """Each vehicle converges to ITS OWN goal through the shared compiled
    step; per-vehicle info stats come back [n]-leading."""
    model, cost, sigma = _family()
    n, k, tau = 4, 256, 15
    goals = np.array([[1.0, 0.0, -0.5, 0.0],
                      [-1.0, 0.0, 0.5, 0.0],
                      [0.5, 0.0, 1.0, 0.0],
                      [-0.5, 0.0, -1.0, 0.0]])
    fleet = FleetMPPI(model, cost, n_vehicles=n, k=k, tau=tau, lam=0.6,
                      upsilon=1.0, sigma=sigma, goals=goals, seed=2)
    mp = model.init_params()
    states = jnp.zeros((n, 4), model.dtype)
    step = jax.jit(jax.vmap(lambda x, u: model.predict(mp, x, u)))
    for _ in range(60):
        actions = fleet.next(np.asarray(states))
        states = step(states, jnp.asarray(actions, model.dtype))
    err = np.linalg.norm(np.asarray(states)[:, 0::2] - goals[:, 0::2],
                         axis=1)
    assert np.all(err < 0.25), err
    assert fleet._last_info["cost_min"].shape == (n,)


def test_fleet_sharded_matches_unsharded():
    """mesh= shards the fleet axis (collective-free data parallelism);
    results are identical to the unsharded fleet with the same keys."""
    from mppi_tf_tpu.parallel import make_mesh

    model, cost, sigma = _family()
    n, k, tau = 8, 64, 5
    goals = np.tile(np.array([[1.0, 0.0, -0.5, 0.0]]), (n, 1))
    goals[:, 0] = np.linspace(-1, 1, n)
    mesh = make_mesh(8, ("fleet",))
    f_ref = FleetMPPI(model, cost, n_vehicles=n, k=k, tau=tau, lam=0.6,
                      upsilon=1.0, sigma=sigma, goals=goals, seed=9)
    f_sh = FleetMPPI(model, cost, n_vehicles=n, k=k, tau=tau, lam=0.6,
                     upsilon=1.0, sigma=sigma, goals=goals, seed=9,
                     mesh=mesh)
    rng = np.random.default_rng(1)
    states = rng.normal(size=(n, 4))
    for _ in range(2):
        a_ref = f_ref.next(states)
        a_sh = f_sh.next(states)
        np.testing.assert_allclose(a_sh, a_ref, rtol=1e-5, atol=1e-7)

    with pytest.raises(ValueError, match="divisible"):
        FleetMPPI(model, cost, n_vehicles=6, k=k, tau=tau, lam=0.6,
                  upsilon=1.0, sigma=sigma, mesh=mesh)
    # an EXPLICIT pallas request cannot be honoured on a fleet mesh and
    # must fail loudly (kernel='auto' falls back to XLA quietly)
    with pytest.raises(ValueError, match="pallas"):
        FleetMPPI(model, cost, n_vehicles=8, k=k, tau=tau, lam=0.6,
                  upsilon=1.0, sigma=sigma, mesh=mesh, kernel="pallas")


def test_fleet_retasking_and_checkpoint(tmp_path):
    """set_goals / set_vehicle_goal re-task without retracing; save/load
    resumes the whole fleet bit-exact."""
    model, cost, sigma = _family()
    n, k, tau = 3, 64, 5
    fleet = FleetMPPI(model, cost, n_vehicles=n, k=k, tau=tau, lam=0.6,
                      upsilon=1.0, sigma=sigma, seed=7)
    states = np.zeros((n, 4))
    fleet.next(states)
    compiles_before = fleet._step_jit._cache_size()

    new_goals = np.array([[0.3, 0.0, 0.3, 0.0]] * n)
    fleet.set_goals(new_goals)
    fleet.set_vehicle_goal(1, [0.9, 0.0, -0.9, 0.0])
    np.testing.assert_allclose(
        np.asarray(fleet._cparams["goal"][1]), [0.9, 0.0, -0.9, 0.0])
    np.testing.assert_allclose(
        np.asarray(fleet._cparams["goal"][0]), [0.3, 0.0, 0.3, 0.0])
    fleet.next(states)
    assert fleet._step_jit._cache_size() == compiles_before  # no retrace

    path = str(tmp_path / "fleet_state.npz")
    fleet.save_state(path)
    a_expected = fleet.next(states)

    resumed = FleetMPPI(model, cost, n_vehicles=n, k=k, tau=tau, lam=0.6,
                        upsilon=1.0, sigma=sigma, seed=0)
    resumed.set_goals(new_goals)
    resumed.set_vehicle_goal(1, [0.9, 0.0, -0.9, 0.0])
    resumed.load_state(path)
    a_resumed = resumed.next(states)
    np.testing.assert_array_equal(a_resumed, a_expected)

    with pytest.raises(IndexError):
        fleet.set_vehicle_goal(99, [0.0, 0.0, 0.0, 0.0])
    with pytest.raises(ValueError, match="one row per vehicle"):
        fleet.set_goals(np.zeros((n + 1, 4)))


@pytest.mark.parametrize("options", [
    {},
    {"normalize_cost": True},
    {"antithetic": True},
    {"normalize_cost": True, "clip_actions": True, "filter_seq": True,
     "filter_window": 5},
])
def test_fleet_fused_kernel_matches_per_vehicle_fused(options):
    """kernel='pallas' scans the vehicles through the fused kernel
    (interpret mode here): each vehicle's action must equal a standalone
    fused MPPI seeded with the fleet's per-vehicle seed block, distinct
    goals must flow through the per-vehicle SMEM packs, and the whole
    single-vehicle option matrix (normalize/antithetic/clip/filter) holds
    per vehicle."""
    model, cost, sigma = _family()
    n, k, tau, tile = 3, 64, 5, 16
    goals = np.array([[1.0, 0.0, -0.5, 0.0],
                      [-0.8, 0.0, 0.3, 0.0],
                      [0.2, 0.0, 1.1, 0.0]])
    fleet = FleetMPPI(model, cost, n_vehicles=n, k=k, tau=tau, lam=0.6,
                      upsilon=1.0, sigma=sigma, goals=goals, seed=11,
                      kernel="pallas", kernel_tile=tile, **options)
    assert fleet._tpl._fused is not None
    n_tiles = fleet._n_tiles

    rng = np.random.default_rng(2)
    states = rng.normal(size=(n, 4))
    a_fleet = fleet.next(states)
    # info schema is kernel-path independent (review r3: the fused scan
    # must not strip the array entries the XLA path returns)
    for key in ("cost_min", "cost_mean", "cost_max", "weighted_noise",
                "useq"):
        assert key in fleet._last_info, key
    assert fleet._last_info["weighted_noise"].shape == (n, tau, 2)

    for v in range(n):
        single = MPPI(model, cost, k=k, tau=tau, lam=0.6, upsilon=1.0,
                      sigma=sigma, seed=11 + v * n_tiles, kernel="pallas",
                      kernel_tile=tile, **options)
        single.set_goal(goals[v])
        a_v = single.next(states[v])
        np.testing.assert_allclose(a_fleet[v], a_v, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(fleet.useq[v]),
                                   np.asarray(single.useq),
                                   rtol=1e-5, atol=1e-7)
    if options:
        return  # the on-device smoke below only needs to run once

    # the fused on-device fleet loop runs and stays finite (interpret-mode
    # PRNG is stubbed, so convergence is only meaningful on hardware)
    from mppi_tf_tpu.envs.mjx_env import JaxPointMassEnv

    env = JaxPointMassEnv(n_dof=2, dt=0.01)
    run = fleet.build_on_device_loop(env.step_fn, steps=4, substeps=2)
    s, a = run(np.zeros((n, 4)))
    assert np.all(np.isfinite(np.asarray(s)))
    assert np.asarray(a).shape == (4, n, 2)


def test_fleet_on_device_loop():
    """The whole fleet experiment — N closed loops with distinct goals —
    compiles into ONE scan program; params resolve from the fleet at call
    time, so re-tasking between runs hits the cached executable."""
    from mppi_tf_tpu.envs.mjx_env import JaxPointMassEnv

    model, cost, sigma = _family()
    n, k, tau = 4, 256, 15
    goals = np.array([[1.0, 0.0, -0.5, 0.0],
                      [-1.0, 0.0, 0.5, 0.0],
                      [0.5, 0.0, 1.0, 0.0],
                      [-0.5, 0.0, -1.0, 0.0]])
    fleet = FleetMPPI(model, cost, n_vehicles=n, k=k, tau=tau, lam=0.6,
                      upsilon=1.0, sigma=sigma, goals=goals, seed=3)
    env = JaxPointMassEnv(n_dof=2, dt=0.01)
    run = fleet.build_on_device_loop(env.step_fn, steps=60, substeps=10)
    states, actions = run(np.zeros((n, 4)))
    states = np.asarray(states)
    assert states.shape == (60, n, 4)
    assert np.asarray(actions).shape == (60, n, 2)
    err = np.linalg.norm(states[-1, :, 0::2] - goals[:, 0::2], axis=1)
    assert np.all(err < 0.25), err

    # re-task one vehicle; the SAME compiled run steers it to the new goal
    fleet.set_vehicle_goal(0, [-0.7, 0.0, 0.7, 0.0])
    states2, _ = run(np.zeros((n, 4)))
    err0 = np.linalg.norm(
        np.asarray(states2)[-1, 0, 0::2] - np.array([-0.7, 0.7]))
    assert err0 < 0.25, err0

    # sharded fleet: same program data-parallel over the 8-device mesh
    from mppi_tf_tpu.parallel import make_mesh

    fleet_sh = FleetMPPI(model, cost, n_vehicles=8, k=64, tau=8, lam=0.6,
                         upsilon=1.0, sigma=sigma, seed=3,
                         mesh=make_mesh(8, ("fleet",)))
    run_sh = fleet_sh.build_on_device_loop(env.step_fn, steps=5,
                                           substeps=2)
    s_sh, a_sh = run_sh(np.zeros((8, 4)))
    assert np.all(np.isfinite(np.asarray(s_sh)))
    assert np.asarray(a_sh).shape == (5, 8, 2)


@pytest.mark.slow
def test_fleet_auv_flagship():
    """The fleet surface is model-agnostic: a fleet of full-Fossen AUVs
    with distinct depth setpoints, fused AUV kernel scanned per vehicle
    (interpret mode), each diving toward its own goal through the shared
    on-device loop."""
    from tests.test_auv_kernel import _auv_cfg

    from mppi_tf_tpu.costs import get_cost
    from mppi_tf_tpu.envs.analytic import AUVEnv
    from mppi_tf_tpu.models import get_model

    n = 2
    sigma = np.diag([2000.0] * 3 + [200.0] * 3)
    model = get_model(_auv_cfg(), dt=0.1, action_dim=6)
    goal = np.zeros(13)
    goal[6] = 1.0
    cost = get_cost({"type": "static_quat", "diag": True,
                     "goal": goal.tolist(),
                     "Q": [60.0, 60.0, 60.0, 10.0,
                           1.0, 1.0, 1.0, 1.0, 1.0, 1.0]},
                    lam=0.5, gamma=0.2, upsilon=1.0, sigma=sigma)
    goals = np.tile(goal, (n, 1))
    goals[0, 2] = -1.0   # vehicle 0 dives
    goals[1, 2] = 1.0    # vehicle 1 rises — opposite directions make the
    # per-vehicle goal flow unambiguous regardless of how tightly this
    # (deliberately untuned) MPPI setup settles on the setpoint
    fleet = FleetMPPI(model, cost, n_vehicles=n, k=256, tau=15, lam=0.5,
                      upsilon=1.0, sigma=sigma, goals=goals, seed=3,
                      kernel="xla")
    env = AUVEnv(_auv_cfg(), dt=0.02)
    run = fleet.build_on_device_loop(env.step_fn, steps=80, substeps=5)
    x0 = np.zeros((n, 13))
    x0[:, 6] = 1.0
    states, _ = run(x0)
    states = np.asarray(states)
    qn = np.linalg.norm(states[:, :, 3:7], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)
    z = states[:, :, 2]
    assert z[-1, 0] < -0.3, z[::10, 0]   # vehicle 0 descending toward -1
    assert z[-1, 1] > 0.3, z[::10, 1]    # vehicle 1 ascending toward +1

    # fused AUV kernel scans across the fleet too (structure check —
    # interpret-mode PRNG is stubbed)
    fleet_p = FleetMPPI(model, cost, n_vehicles=n, k=64, tau=4, lam=0.5,
                        upsilon=1.0, sigma=sigma, goals=goals, seed=3,
                        kernel="pallas", kernel_tile=32)
    assert fleet_p._tpl._fused is not None
    a = fleet_p.next(x0)
    assert a.shape == (n, 6) and np.all(np.isfinite(a))


def test_fleet_factory_dispatch():
    """get_controller builds a FleetMPPI from the env-config 'fleet' key
    (with per-vehicle 'goals'); DMD models and observers are rejected
    loudly."""
    from mppi_tf_tpu.controller import get_controller
    from mppi_tf_tpu.models.dmd import DMDModel

    model, cost, sigma = _family()
    cfg = {"samples": 64, "horizon": 5, "lambda": 0.6, "upsilon": 1.0,
           "noise": sigma.tolist(), "fleet": 3,
           "goals": [[1.0, 0.0, -0.5, 0.0],
                     [-0.8, 0.0, 0.3, 0.0],
                     [0.2, 0.0, 1.1, 0.0]]}
    fleet = get_controller(model, cost, cfg)
    assert isinstance(fleet, FleetMPPI) and fleet.n_vehicles == 3
    a = fleet.next(np.zeros((3, 4)))
    assert a.shape == (3, 2) and np.all(np.isfinite(a))
    np.testing.assert_allclose(np.asarray(fleet._cparams["goal"][1]),
                               [-0.8, 0.0, 0.3, 0.0])

    with pytest.raises(ValueError, match="DMD"):
        get_controller(DMDModel(4, 2), cost, cfg)

    class _Obs:
        pass

    with pytest.raises(ValueError, match="observer"):
        get_controller(model, cost, cfg, observer=_Obs())


def test_fleet_waypoint_missions():
    """Fleet + WayPointsCost: each vehicle flies ITS OWN waypoint queue
    through the shared compiled step; advance_waypoints pops queues
    independently as vehicles reach their leading waypoints."""
    from mppi_tf_tpu.models import get_model

    sigma = np.diag([0.4, 0.4])
    model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                      state_dim=4, action_dim=2)
    cost = get_cost({"type": "waypoints", "diag": True, "alpha": 0.2,
                     "waypoints": [[0.0, 0.0, 0.0, 0.0]],
                     "Q": [8.0, 1.5, 8.0, 1.5]},
                    lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma)
    n = 2
    fleet = FleetMPPI(model, cost, n_vehicles=n, k=256, tau=15, lam=0.6,
                      upsilon=1.0, sigma=sigma, seed=2)
    missions = [
        [[0.8, 0.0, 0.0, 0.0], [0.8, 0.0, 0.8, 0.0]],    # L path, vehicle 0
        [[-0.8, 0.0, 0.0, 0.0], [-0.8, 0.0, -0.8, 0.0]],  # mirrored
    ]
    for v, m in enumerate(missions):
        fleet.set_vehicle_waypoints(v, m)
    assert int(fleet._cparams["count"][0]) == 2

    mp = model.init_params()
    states = np.zeros((n, 4))
    step = jax.jit(jax.vmap(lambda x, u: model.predict(mp, x, u)))
    popped_at = [None] * n
    for t in range(100):
        actions = fleet.next(states)
        states = np.asarray(step(jnp.asarray(states, model.dtype),
                                 jnp.asarray(actions, model.dtype)))
        if fleet.advance_waypoints(states, radius=0.35):
            for v in range(n):
                if popped_at[v] is None and int(
                        fleet._cparams["count"][v]) == 1:
                    popped_at[v] = t
    # both queues advanced, and each vehicle finished at ITS final waypoint
    assert all(p is not None for p in popped_at), popped_at
    finals = np.array([m[-1] for m in missions])
    err = np.linalg.norm(states[:, 0::2] - finals[:, 0::2], axis=1)
    assert np.all(err < 0.3), (err, states)

    with pytest.raises(IndexError):
        fleet.set_vehicle_waypoints(9, missions[0])
    with pytest.raises(ValueError, match="non-empty"):
        fleet.set_vehicle_waypoints(0, [])
    # guards on non-waypoint fleets
    model2, cost2, sigma2 = _family()
    plain = FleetMPPI(model2, cost2, n_vehicles=2, k=16, tau=3, lam=0.6,
                      upsilon=1.0, sigma=sigma2)
    with pytest.raises(TypeError, match="WayPointsCost"):
        plain.advance_waypoints(np.zeros((2, 4)), 0.1)
    with pytest.raises(TypeError, match="WayPointsCost"):
        plain.set_vehicle_waypoints(0, missions[0])


def test_fleet_on_device_waypoint_missions():
    """Per-vehicle waypoint pops run INSIDE the compiled fleet scan
    (waypoint_radius=): N multi-leg missions with zero host round trips;
    final queue states sync back to the fleet."""
    from mppi_tf_tpu.envs.mjx_env import JaxPointMassEnv
    from mppi_tf_tpu.models import get_model

    sigma = np.diag([0.4, 0.4])
    model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                      state_dim=4, action_dim=2)
    cost = get_cost({"type": "waypoints", "diag": True, "alpha": 0.2,
                     "waypoints": [[0.0, 0.0, 0.0, 0.0]],
                     "Q": [8.0, 1.5, 8.0, 1.5]},
                    lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma)
    n = 2
    fleet = FleetMPPI(model, cost, n_vehicles=n, k=256, tau=15, lam=0.6,
                      upsilon=1.0, sigma=sigma, seed=2)
    missions = [
        [[0.8, 0.0, 0.0, 0.0], [0.8, 0.0, 0.8, 0.0]],
        [[-0.8, 0.0, 0.0, 0.0], [-0.8, 0.0, -0.8, 0.0]],
    ]
    for v, m in enumerate(missions):
        fleet.set_vehicle_waypoints(v, m)

    env = JaxPointMassEnv(n_dof=2, dt=0.01)
    run = fleet.build_on_device_loop(env.step_fn, steps=100, substeps=10,
                                     waypoint_radius=0.35)
    states, _ = run(np.zeros((n, 4)))
    states = np.asarray(states)
    # both queues advanced in-scan and synced back to the fleet
    assert list(np.asarray(fleet._cparams["count"])) == [1, 1]
    finals = np.array([m[-1] for m in missions])
    err = np.linalg.norm(states[-1, :, 0::2] - finals[:, 0::2], axis=1)
    assert np.all(err < 0.3), (err, states[-1])

    # guard: non-waypoint fleets reject waypoint_radius
    model2, cost2, sigma2 = _family()
    plain = FleetMPPI(model2, cost2, n_vehicles=2, k=16, tau=3, lam=0.6,
                      upsilon=1.0, sigma=sigma2)
    with pytest.raises(TypeError, match="WayPointsCost"):
        plain.build_on_device_loop(env.step_fn, steps=2,
                                   waypoint_radius=0.1)


def test_fleet_validates_construction():
    model, cost, sigma = _family()
    with pytest.raises(ValueError, match="n_vehicles"):
        FleetMPPI(model, cost, n_vehicles=0, k=8, tau=3, lam=0.6,
                  upsilon=1.0, sigma=sigma)
    with pytest.raises(ValueError, match="one row per vehicle"):
        FleetMPPI(model, cost, n_vehicles=2, k=8, tau=3, lam=0.6,
                  upsilon=1.0, sigma=sigma, goals=np.zeros((3, 4)))
    with pytest.raises(ValueError, match="init_seq"):
        FleetMPPI(model, cost, n_vehicles=2, k=8, tau=3, lam=0.6,
                  upsilon=1.0, sigma=sigma, init_seq=np.zeros((5, 2, 7)))


def test_fleet_quat_waypoint_missions():
    """Fleet of 13-dim AUVs + WayPointsQuatCost: per-vehicle quaternion
    missions through the shared compiled step, with the attitude-aware pop
    metric (a vehicle AT the waypoint position but rotated 180 deg must
    not pop)."""
    from tests.test_auv_kernel import _auv_cfg

    from mppi_tf_tpu.models import get_model

    sigma = np.diag([2000.0] * 3 + [200.0] * 3)
    model = get_model(_auv_cfg(), dt=0.1, action_dim=6)
    wp = np.zeros(13)
    wp[2], wp[6] = -1.0, 1.0
    cost = get_cost({"type": "waypoints_quat", "diag": True, "alpha": 0.2,
                     "waypoints": [wp.tolist()],
                     "Q": [60.0, 60.0, 60.0, 10.0,
                           1.0, 1.0, 1.0, 1.0, 1.0, 1.0]},
                    lam=0.5, gamma=0.2, upsilon=1.0, sigma=sigma)
    fleet = FleetMPPI(model, cost, n_vehicles=2, k=64, tau=4, lam=0.5,
                      upsilon=1.0, sigma=sigma, seed=2)
    wp_b = wp.copy()
    wp_b[0] = 2.0
    deeper = wp.copy()
    deeper[2] = -2.0
    fleet.set_vehicle_waypoints(0, [wp, deeper])
    fleet.set_vehicle_waypoints(1, [wp_b, deeper])
    np.testing.assert_array_equal(fleet.waypoints_remaining(), [2, 2])

    states = np.zeros((2, 13))
    states[:, 6] = 1.0
    actions = fleet.next(states)
    assert actions.shape == (2, 6)
    assert np.all(np.isfinite(actions))

    # vehicle 0 sits aligned ON its waypoint -> pops; vehicle 1 sits at
    # ITS waypoint's position but yawed 180 deg -> theta = pi blocks it
    states[0] = wp
    states[1] = wp_b
    states[1, 3:7] = [0.0, 0.0, 1.0, 0.0]
    assert fleet.advance_waypoints(states, radius=0.5)
    np.testing.assert_array_equal(fleet.waypoints_remaining(), [1, 2])


def test_fleet_goal_surfaces_validate_quat_waypoints():
    """Review finding: set_goals / __init__(goals=) route cost.set_goal
    through vmap, where tracers skip the unit-quaternion validation — the
    fleet must validate host-side BEFORE vmapping so a remote fleet
    re-goal cannot silently store a degenerate attitude."""
    from tests.test_auv_kernel import _auv_cfg

    from mppi_tf_tpu.models import get_model

    sigma = np.diag([2000.0] * 3 + [200.0] * 3)
    model = get_model(_auv_cfg(), dt=0.1, action_dim=6)
    wp = np.zeros(13)
    wp[2], wp[6] = -1.0, 1.0
    cost = get_cost({"type": "waypoints_quat", "diag": True,
                     "waypoints": [wp.tolist()],
                     "Q": [60.0, 60.0, 60.0, 10.0,
                           1.0, 1.0, 1.0, 1.0, 1.0, 1.0]},
                    lam=0.5, gamma=0.2, upsilon=1.0, sigma=sigma)
    bad = np.zeros((2, 13))  # zero quaternions
    with pytest.raises(ValueError, match="unit"):
        FleetMPPI(model, cost, n_vehicles=2, k=16, tau=3, lam=0.5,
                  upsilon=1.0, sigma=sigma, goals=bad)
    fleet = FleetMPPI(model, cost, n_vehicles=2, k=16, tau=3, lam=0.5,
                      upsilon=1.0, sigma=sigma)
    with pytest.raises(ValueError, match="unit"):
        fleet.set_goals(bad)
    # valid goals (mild drift) renormalise and apply
    good = np.stack([wp, wp])
    good[:, 3:7] *= 1.0 + 5e-4
    fleet.set_goals(good)
    q = np.asarray(fleet._cparams["waypoints"][:, 0, 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-6)


@pytest.mark.slow  # interpret-mode AUV kernel: minutes-scale
def test_fleet_fused_quat_missions_match_per_vehicle_fused():
    """kernel='pallas' fleet over WayPointsQuatCost (interpret mode):
    per-vehicle quaternion mission queues flow through the per-vehicle
    SMEM packs (two goals + blend weights), and a queue pop re-packs
    without recompiling — each vehicle must equal a standalone fused MPPI
    with the same mission, before AND after the pop."""
    from tests.test_auv_kernel import _auv_cfg

    from mppi_tf_tpu.models import get_model

    sigma = np.diag([40.0] * 3 + [5.0] * 3)
    model = get_model(_auv_cfg(), dt=0.1, action_dim=6)
    wp_a1 = np.zeros(13); wp_a1[2], wp_a1[6] = -1.0, 1.0
    wp_a2 = np.zeros(13); wp_a2[2], wp_a2[6] = -2.0, 1.0
    wp_b1 = np.zeros(13)
    wp_b1[0], wp_b1[2] = 2.0, -1.0
    wp_b1[3], wp_b1[6] = np.sin(0.3), np.cos(0.3)
    wp_b2 = wp_a2
    cost = get_cost({"type": "waypoints_quat", "diag": True, "alpha": 0.25,
                     "waypoints": [wp_a1.tolist()],
                     "Q": [60.0, 60.0, 60.0, 10.0,
                           1.0, 1.0, 1.0, 1.0, 1.0, 1.0]},
                    lam=0.5, gamma=0.2, upsilon=1.0, sigma=sigma)
    n, k, tau, tile = 2, 32, 2, 16
    fleet = FleetMPPI(model, cost, n_vehicles=n, k=k, tau=tau, lam=0.5,
                      upsilon=1.0, sigma=sigma, seed=7, kernel="pallas",
                      kernel_tile=tile)
    assert fleet._tpl._fused is not None
    missions = [[wp_a1, wp_a2], [wp_b1, wp_b2]]
    for v, m in enumerate(missions):
        fleet.set_vehicle_waypoints(v, m)
    n_tiles = fleet._n_tiles
    states = np.zeros((n, 13))
    states[:, 6] = 1.0
    a_fleet = fleet.next(states)

    singles = []
    for v in range(n):
        s = MPPI(model, cost, k=k, tau=tau, lam=0.5, upsilon=1.0,
                 sigma=sigma, seed=7 + v * n_tiles, kernel="pallas",
                 kernel_tile=tile)
        s.set_waypoints(missions[v])
        np.testing.assert_allclose(a_fleet[v], s.next(states[v]),
                                   rtol=1e-5, atol=1e-7)
        singles.append(s)

    # vehicle 0 reaches its leading waypoint -> ITS queue pops; the next
    # fleet step must equal singles with the same post-pop queues
    states[0] = wp_a1
    assert fleet.advance_waypoints(states, radius=0.5) == 1
    assert singles[0].advance_waypoints(states[0], radius=0.5) is True
    a_fleet2 = fleet.next(states)
    for v in range(n):
        np.testing.assert_allclose(a_fleet2[v], singles[v].next(states[v]),
                                   rtol=1e-5, atol=1e-7)

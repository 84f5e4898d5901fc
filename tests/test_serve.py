"""Control serving (mppi_tf_tpu/serve.py): the reference's ROS-node role —
an external vehicle stack driving the controller over a socket — as a
JSON-lines TCP protocol. Tests run a real server thread and a real client.
"""

import numpy as np
import pytest

from mppi_tf_tpu.controller import FleetMPPI, MPPI
from mppi_tf_tpu.costs import get_cost
from mppi_tf_tpu.models import get_model
from mppi_tf_tpu.serve import ControlClient, ControlServer

# oracle/cluster/serve tail: excluded from the fast developer loop
# (pytest -m 'not slow'); the driver default runs everything
pytestmark = pytest.mark.slow


def _family():
    sigma = np.diag([0.4, 0.4])
    model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                      state_dim=4, action_dim=2)
    cost = get_cost({"type": "static", "diag": True,
                     "goal": [1.0, 0.0, -0.5, 0.0],
                     "Q": [8.0, 1.5, 8.0, 1.5]},
                    lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma)
    return model, cost, sigma


@pytest.fixture()
def served():
    model, cost, sigma = _family()
    ctrl = MPPI(model, cost, k=256, tau=15, lam=0.6, upsilon=1.0,
                sigma=sigma, seed=2)
    server = ControlServer(ctrl)
    host, port = server.serve_background()
    client = ControlClient(host, port)
    yield model, ctrl, client
    client.close()
    server.close()


def test_served_closed_loop_converges(served):
    """The full deployment shape: the 'vehicle stack' (this test) holds the
    plant, the controller lives behind the socket; the served closed loop
    reaches the goal, then a set_goal over the wire re-targets it."""
    model, ctrl, client = served
    info = client.info()
    assert info["controller"] == "MPPI" and info["k"] == 256

    mp = model.init_params()
    x = np.zeros(4)
    for _ in range(60):
        u = client.next(x)
        assert u.shape == (2,)
        x = np.asarray(model.predict(mp, x, u)).reshape(-1)
    assert np.linalg.norm(x[0::2] - np.array([1.0, -0.5])) < 0.25, x

    client.set_goal([-0.5, 0.0, 0.8, 0.0])
    for _ in range(60):
        x = np.asarray(model.predict(mp, x, client.next(x))).reshape(-1)
    assert np.linalg.norm(x[0::2] - np.array([-0.5, 0.8])) < 0.25, x


def test_server_survives_bad_requests(served):
    """Protocol errors come back as {'error': ...} and the SAME connection
    keeps serving — a malformed tick from the vehicle stack must not drop
    control."""
    _model, _ctrl, client = served
    assert client.request(op="ping") == {"ok": True}
    resp = client.request(op="warp")
    assert "unknown op" in resp["error"]
    resp = client.request(op="next", state=[[1, 2], [3]])  # ragged
    assert "error" in resp
    resp = client.request(op="next")  # missing field
    assert "error" in resp
    # still alive, still correct
    u = client.next(np.zeros(4))
    assert u.shape == (2,)
    # save() without an observer is a no-op on plain MPPI but must not err
    resp = client.request(op="save", x=[0, 0, 0, 0], u=[0, 0],
                          x_next=[0, 0, 0, 0])
    assert resp == {"ok": True}


def test_served_adaptive_dmd_identifies_over_the_wire():
    """save() ticks stream transitions into the served DMD controller; the
    online identification runs server-side (the MBRL deployment loop)."""
    from mppi_tf_tpu.controller.dmd import DMDMPPI
    from mppi_tf_tpu.models.dmd import DMDModel

    model, cost, sigma = _family()
    dmd = DMDModel(4, 2, reg=1e-10)
    ctrl = DMDMPPI(dmd, cost, k=64, tau=8, lam=0.6, upsilon=1.0,
                   sigma=sigma, seed=2, refit_every=4, min_samples=6)
    server = ControlServer(ctrl)
    host, port = server.serve_background()
    client = ControlClient(host, port)
    try:
        mp = model.init_params()
        rng = np.random.default_rng(0)
        x = np.zeros(4)
        for _ in range(8):
            u = rng.uniform(-1, 1, 2)
            xn = np.asarray(model.predict(mp, x, u)).reshape(-1)
            client.save(x, u, xn)
            x = xn
        assert ctrl.n_fits >= 1
        np.testing.assert_allclose(np.asarray(ctrl.model_params["A"]),
                                   np.asarray(model._A), atol=1e-4)
    finally:
        client.close()
        server.close()


def test_close_before_serving_returns_promptly():
    """Regression (review r3): close() on a server whose accept loop never
    started used to deadlock in shutdown() (the Event it waits on is only
    ever set by serve_forever)."""
    import time

    model, cost, sigma = _family()
    ctrl = MPPI(model, cost, k=8, tau=3, lam=0.6, upsilon=1.0, sigma=sigma)
    server = ControlServer(ctrl)
    t0 = time.perf_counter()
    server.close()
    assert time.perf_counter() - t0 < 1.0


def test_served_fleet():
    """A FleetMPPI behind the same endpoint: batched states in, batched
    actions out, whole-fleet re-tasking via set_goal [n, dim]."""
    model, cost, sigma = _family()
    goals = np.array([[1.0, 0.0, -0.5, 0.0], [-0.8, 0.0, 0.3, 0.0]])
    fleet = FleetMPPI(model, cost, n_vehicles=2, k=64, tau=8, lam=0.6,
                      upsilon=1.0, sigma=sigma, goals=goals, seed=2)
    server = ControlServer(fleet)
    host, port = server.serve_background()
    client = ControlClient(host, port)
    try:
        assert client.info()["n_vehicles"] == 2
        a = client.next(np.zeros((2, 4)))
        assert a.shape == (2, 2)
        client.set_goal(np.array([[0.2, 0.0, 0.2, 0.0],
                                  [0.4, 0.0, 0.4, 0.0]]))
        np.testing.assert_allclose(np.asarray(fleet._cparams["goal"][1]),
                                   [0.4, 0.0, 0.4, 0.0])
        # 1-D goal broadcasts to the whole fleet
        client.set_goal([0.7, 0.0, -0.7, 0.0])
        np.testing.assert_allclose(np.asarray(fleet._cparams["goal"]),
                                   np.tile([0.7, 0.0, -0.7, 0.0], (2, 1)))
        # a 'vehicle' field re-tasks one vehicle only
        resp = client.request(op="set_goal", vehicle=1,
                              goal=[0.1, 0.0, 0.1, 0.0])
        assert resp == {"ok": True}
        np.testing.assert_allclose(np.asarray(fleet._cparams["goal"][0]),
                                   [0.7, 0.0, -0.7, 0.0])
        np.testing.assert_allclose(np.asarray(fleet._cparams["goal"][1]),
                                   [0.1, 0.0, 0.1, 0.0])
    finally:
        client.close()
        server.close()


def test_served_mission_single_controller():
    """Mission ops over the wire: upload a 2-leg mission, fly it through
    next() + advance_waypoints — the queue pops server-side and the plant
    finishes on the final leg."""
    from mppi_tf_tpu.costs.waypoints import WayPointsCost

    wp1 = [0.8, 0.0, 0.0, 0.0]
    wp2 = [0.8, 0.0, -0.7, 0.0]
    sigma = np.diag([0.4, 0.4])
    from mppi_tf_tpu.models import get_model as _gm

    model = _gm({"type": "point_mass", "mass": 1.0}, dt=0.1,
                state_dim=4, action_dim=2)
    cost = WayPointsCost(0.4, 0.1, 1.0, sigma, Q=np.array(
        [6.0, 0.6, 6.0, 0.6]), diag=True, waypoints=[wp1])
    ctrl = MPPI(model, cost, k=300, tau=12, lam=0.4, upsilon=1.0,
                sigma=sigma, seed=5)
    server = ControlServer(ctrl)
    host, port = server.serve_background()
    client = ControlClient(host, port)
    try:
        client.set_waypoints([wp1, wp2])
        assert ctrl.waypoints_remaining() == 2
        mp = model.init_params()
        x = np.zeros(4)
        popped = 0
        for _ in range(160):
            x = np.asarray(model.predict(mp, x, client.next(x))).reshape(-1)
            resp = client.advance_waypoints(x, radius=0.25)
            popped += resp["advanced"]
            if resp["remaining"] == 1 and \
                    np.linalg.norm(x - np.asarray(wp2)) < 0.2:
                break
        assert popped == 1
        assert np.linalg.norm(x - np.asarray(wp2)) < 0.2
        # a non-mission op catalogue error is a response, not a crash
        resp = client.request(op="set_waypoints")  # missing field
        assert "error" in resp
    finally:
        client.close()
        server.close()


def test_served_fleet_mission_ops():
    """Per-vehicle mission upload + whole-fleet queue advancement over the
    wire (FleetMPPI behind the endpoint)."""
    from mppi_tf_tpu.costs.waypoints import WayPointsCost
    from mppi_tf_tpu.models import get_model as _gm

    wp_a = [[0.6, 0.0, 0.0, 0.0], [0.6, 0.0, 0.6, 0.0]]
    wp_b = [[-0.5, 0.0, 0.0, 0.0]]
    sigma = np.diag([0.4, 0.4])
    model = _gm({"type": "point_mass", "mass": 1.0}, dt=0.1,
                state_dim=4, action_dim=2)
    cost = WayPointsCost(0.4, 0.1, 1.0, sigma, Q=np.array(
        [6.0, 0.6, 6.0, 0.6]), diag=True,
        waypoints=[[0.0, 0.0, 0.0, 0.0]])
    fleet = FleetMPPI(model, cost, n_vehicles=2, k=64, tau=8, lam=0.4,
                      upsilon=1.0, sigma=sigma, seed=2)
    server = ControlServer(fleet)
    host, port = server.serve_background()
    client = ControlClient(host, port)
    try:
        client.set_waypoints(wp_a, vehicle=0)
        client.set_waypoints(wp_b, vehicle=1)
        np.testing.assert_array_equal(fleet.waypoints_remaining(), [2, 1])
        # a fleet upload WITHOUT a vehicle index is a protocol error
        resp = client.request(op="set_waypoints", waypoints=wp_a)
        assert "vehicle" in resp["error"]
        # vehicle 0 sits on its leading waypoint -> its queue pops; the
        # single-leg vehicle never pops below 1
        states = np.asarray([wp_a[0], wp_b[0]])
        resp = client.advance_waypoints(states, radius=0.25)
        assert resp["advanced"] == 1
        assert resp["remaining"] == [1, 1]
    finally:
        client.close()
        server.close()


def test_served_quat_mission_ops():
    """Quaternion waypoint missions over the wire: upload validates the
    attitude block (a non-unit quaternion is an error RESPONSE, not a
    crash), and advance_waypoints pops with the quaternion-aware metric."""
    from tests.test_auv_kernel import _auv_cfg

    from mppi_tf_tpu.costs import get_cost as _gc
    from mppi_tf_tpu.models import get_model as _gm

    sigma = np.diag([2000.0] * 3 + [200.0] * 3)
    model = _gm(_auv_cfg(), dt=0.1, action_dim=6)
    wp1 = np.zeros(13)
    wp1[2], wp1[6] = -1.0, 1.0
    wp2 = np.zeros(13)
    wp2[2], wp2[6] = -2.0, 1.0
    cost = _gc({"type": "waypoints_quat", "diag": True,
                "waypoints": [wp1.tolist()],
                "Q": [60.0, 60.0, 60.0, 10.0,
                      1.0, 1.0, 1.0, 1.0, 1.0, 1.0]},
               lam=0.5, gamma=0.2, upsilon=1.0, sigma=sigma)
    ctrl = MPPI(model, cost, k=64, tau=4, lam=0.5, upsilon=1.0,
                sigma=sigma, seed=5)
    server = ControlServer(ctrl)
    host, port = server.serve_background()
    client = ControlClient(host, port)
    try:
        # a zero-quaternion waypoint is rejected loudly, queue untouched
        bad = np.zeros(13)
        resp = client.request(op="set_waypoints",
                              waypoints=[bad.tolist()])
        assert "error" in resp and "unit" in resp["error"]
        client.set_waypoints([wp1.tolist(), wp2.tolist()])
        assert ctrl.waypoints_remaining() == 2
        x = np.zeros(13)
        x[6] = 1.0
        u = client.next(x)
        assert np.asarray(u).shape == (6,)
        resp = client.advance_waypoints(wp1.tolist(), radius=0.5)
        assert resp["advanced"] == 1 and resp["remaining"] == 1
    finally:
        client.close()
        server.close()


def test_served_vehicle_index_on_single_controller_rejected():
    """Advisor r3: a 'vehicle' index sent to a non-fleet server silently
    replaced the single controller's whole mission — now it is an error
    response and the queue is untouched."""
    from mppi_tf_tpu.costs.waypoints import WayPointsCost
    from mppi_tf_tpu.models import get_model as _gm

    wp1 = [0.8, 0.0, 0.0, 0.0]
    wp2 = [0.8, 0.0, -0.7, 0.0]
    sigma = np.diag([0.4, 0.4])
    model = _gm({"type": "point_mass", "mass": 1.0}, dt=0.1,
                state_dim=4, action_dim=2)
    cost = WayPointsCost(0.4, 0.1, 1.0, sigma, Q=np.array(
        [6.0, 0.6, 6.0, 0.6]), diag=True, waypoints=[wp1])
    ctrl = MPPI(model, cost, k=32, tau=4, lam=0.4, upsilon=1.0,
                sigma=sigma, seed=5)
    server = ControlServer(ctrl)
    host, port = server.serve_background()
    client = ControlClient(host, port)
    try:
        client.set_waypoints([wp1, wp2])
        resp = client.request(op="set_waypoints", waypoints=[wp1],
                              vehicle=0)
        assert "error" in resp and "not a fleet" in resp["error"]
        assert ctrl.waypoints_remaining() == 2  # mission untouched
    finally:
        client.close()
        server.close()


def test_served_set_goal_vehicle_index_on_single_controller_rejected():
    """Review finding: the advisor-r3 guard existed on set_waypoints but
    not on the adjacent set_goal op — a 'vehicle' index against a
    non-fleet server must be an error, not a silent full re-goal."""
    model, cost, sigma = _family()
    ctrl = MPPI(model, cost, k=32, tau=4, lam=0.6, upsilon=1.0,
                sigma=sigma, seed=5)
    goal_before = np.asarray(ctrl._cparams["goal"]).copy()
    server = ControlServer(ctrl)
    host, port = server.serve_background()
    client = ControlClient(host, port)
    try:
        resp = client.request(op="set_goal", goal=[9.0, 0.0, 9.0, 0.0],
                              vehicle=2)
        assert "error" in resp and "not a fleet" in resp["error"]
        np.testing.assert_array_equal(
            np.asarray(ctrl._cparams["goal"]), goal_before)
    finally:
        client.close()
        server.close()


def test_mstep_reply_single_controller(served):
    """{"op": "next", "m": 5}: the reply carries the first m actions of
    the updated plan — actions[0] is the applied action and actions[1:]
    are the head of the shifted nominal sequence (the open-loop
    continuation the client can apply while not replanning)."""
    _model, ctrl, client = served
    plan = client.next_plan(np.zeros(4), m=5)
    assert plan.shape == (5, 2)
    np.testing.assert_allclose(plan[1:], np.asarray(ctrl.useq)[:4],
                               rtol=1e-6)
    # m=1 degenerates to the plain reply shape
    resp = client.request(op="next", state=[0.0] * 4, m=1)
    assert "actions" not in resp and len(resp["action"]) == 2
    resp = client.request(op="next", state=[0.0] * 4, m=0)
    assert "error" in resp


def test_mstep_open_loop_tracks(served):
    """Driving the plant with m-step replies (replan every m ticks)
    still converges — the amortized-RTT deployment mode works end to
    end."""
    model, _ctrl, client = served
    mp = model.init_params()
    x = np.zeros(4)
    m = 3
    for _ in range(25):  # 75 control ticks at 25 round trips
        plan = client.next_plan(x, m=m)
        for u in plan:
            x = np.asarray(model.predict(mp, x, u)).reshape(-1)
    assert np.linalg.norm(x[0::2] - np.array([1.0, -0.5])) < 0.3, x


def test_fleet_coalescing_batches_concurrent_requests():
    """N concurrent per-vehicle requests coalesce into ~1 fleet dispatch:
    with the fleet solve held slow, the requests queued during the
    leader's solve are all served by the SECOND dispatch (batched == 3),
    and every client gets its own vehicle's row."""
    import threading
    import time as _time

    model, cost, sigma = _family()
    goals = np.tile([1.0, 0.0, -0.5, 0.0], (4, 1))
    fleet = FleetMPPI(model, cost, n_vehicles=4, k=64, tau=8, lam=0.6,
                      upsilon=1.0, sigma=sigma, goals=goals, seed=2)
    real_next = fleet.next

    def slow_next(states):
        _time.sleep(0.25)  # hold the dispatch so followers queue up
        return real_next(states)

    fleet.next = slow_next
    server = ControlServer(fleet)
    host, port = server.serve_background()
    try:
        results = {}

        def hammer(v):
            c = ControlClient(host, port)
            try:
                results[v] = c.request(op="next", vehicle=v,
                                       state=[0.1 * v] * 4)
            finally:
                c.close()

        threads = [threading.Thread(target=hammer, args=(v,))
                   for v in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert set(results) == {0, 1, 2, 3}
        batched = [r["batched"] for r in results.values()]
        # one leader solves alone (or with early arrivals); everyone who
        # queued during its 250 ms solve shares ONE later dispatch
        assert max(batched) >= 3, batched
        for v, r in results.items():
            assert len(r["action"]) == 2 and "error" not in r
        # m-step + vehicle composes
        c = ControlClient(host, port)
        try:
            plan = c.next_plan([0.0] * 4, m=4, vehicle=2)
            assert plan.shape == (4, 2)
            np.testing.assert_allclose(plan[1:],
                                       np.asarray(fleet.useq)[2, :3],
                                       rtol=1e-6)
        finally:
            c.close()
    finally:
        server.close()


def test_vehicle_next_on_single_controller_rejected(served):
    _model, _ctrl, client = served
    resp = client.request(op="next", vehicle=0, state=[0.0] * 4)
    assert "FleetMPPI" in resp["error"]


def test_coalescer_vehicle_out_of_range():
    model, cost, sigma = _family()
    fleet = FleetMPPI(model, cost, n_vehicles=2, k=32, tau=5, lam=0.6,
                      upsilon=1.0, sigma=sigma, seed=2)
    server = ControlServer(fleet)
    host, port = server.serve_background()
    client = ControlClient(host, port)
    try:
        resp = client.request(op="next", vehicle=7, state=[0.0] * 4)
        assert "out of range" in resp["error"]
        # server still healthy after the error
        a = client.next([0.0] * 4, vehicle=1)
        assert a.shape == (2,)
    finally:
        client.close()
        server.close()

"""Sharded-solve tests on the 8-device virtual CPU mesh.

The key property (SURVEY.md §4): sharded solve == single-device solve to
tolerance when the same noise realisation is injected as data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_tf_tpu.controller.mppi import MPPI
from mppi_tf_tpu.costs.static import StaticCost
from mppi_tf_tpu.models.point_mass import PointMassModel
from mppi_tf_tpu.parallel import ShardedMPPI, build_sharded_solve, make_mesh


def _setup(k=64, tau=8, lam=1.2, gamma=1.1, ups=2.0):
    dt = 0.1
    sigma = np.diag([0.25, 0.3, 0.2])
    goal = np.zeros(6)
    goal[0] = 1.0
    model = PointMassModel(mass=1.5, dt=dt, state_dim=6, action_dim=3,
                           dtype=jnp.float64)
    cost = StaticCost(lam, gamma, ups, sigma, goal, np.eye(6),
                      dtype=jnp.float64)
    return model, cost, sigma, lam, ups


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["k"] == 8


@pytest.mark.parametrize("normalize", [False, True])
def test_sharded_equals_single_device(normalize):
    model, cost, sigma, lam, ups = _setup()
    k, tau = 64, 8
    mesh = make_mesh()
    _, sharded_with_noise = build_sharded_solve(
        model, cost, k, tau, lam, ups, sigma, mesh,
        normalize_cost=normalize,
    )
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=lam, upsilon=ups, sigma=sigma,
                normalize_cost=normalize)

    rng = np.random.default_rng(20)
    eps = jnp.asarray(rng.normal(size=(k, tau, 3)) * 0.3)
    x0 = jnp.asarray(rng.normal(size=6))
    useq = jnp.asarray(rng.normal(size=(tau, 3)) * 0.1)

    a_s, u_s, info_s = sharded_with_noise(
        eps, x0, useq, ctrl.model_params, ctrl._cparams)
    a_1, u_1, info_1 = ctrl._solve_with_noise_jit(
        eps, x0, useq, ctrl.model_params, ctrl._cparams)

    np.testing.assert_allclose(a_s, a_1, rtol=1e-10)
    np.testing.assert_allclose(u_s, u_1, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(info_s["cost_min"], info_1["cost_min"],
                               rtol=1e-12)


def test_sharded_controller_closed_loop():
    model, cost, sigma, lam, ups = _setup()
    mesh = make_mesh()
    ctrl = ShardedMPPI(model, cost, mesh, k=512, tau=20, lam=0.8, upsilon=1.0,
                       sigma=sigma)
    mp = ctrl.model_params
    x = jnp.zeros(6, dtype=jnp.float64)
    for _ in range(40):
        u = ctrl.next(np.asarray(x))
        x = model.predict(mp, x, jnp.asarray(u))
    final = np.asarray(x)
    assert abs(final[0] - 1.0) < 0.25, f"did not reach goal: {final}"


def test_sharded_antithetic_closed_loop():
    model, cost, sigma, lam, ups = _setup()
    mesh = make_mesh()
    ctrl = ShardedMPPI(model, cost, mesh, k=512, tau=20, lam=0.8, upsilon=1.0,
                       sigma=sigma, antithetic=True)
    mp = ctrl.model_params
    x = jnp.zeros(6, dtype=jnp.float64)
    for _ in range(40):
        u = ctrl.next(np.asarray(x))
        x = model.predict(mp, x, jnp.asarray(u))
    final = np.asarray(x)
    assert abs(final[0] - 1.0) < 0.25, f"did not reach goal: {final}"


def test_k_not_divisible_raises():
    model, cost, sigma, lam, ups = _setup()
    mesh = make_mesh()
    with pytest.raises(ValueError):
        build_sharded_solve(model, cost, 13, 4, lam, ups, sigma, mesh)


def test_sharded_noise_shards_differ():
    """Each device must draw independent noise (key folded by axis index)."""
    model, cost, sigma, lam, ups = _setup()
    mesh = make_mesh()
    k, tau = 64, 4

    from functools import partial
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
        sm = partial(shard_map, mesh=mesh, in_specs=(P(),), out_specs=P("k"))
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm
        sm = partial(_sm, mesh=mesh, in_specs=(P(),), out_specs=P("k"))

    from mppi_tf_tpu.ops.noise import sample_noise

    @sm
    def draw(key):
        idx = jax.lax.axis_index("k")
        key = jax.random.fold_in(key, idx)
        return sample_noise(key, k // 8, tau, 3, jnp.asarray(sigma),
                            dtype=jnp.float64)

    eps = np.asarray(draw(jax.random.PRNGKey(0)))
    shards = eps.reshape(8, k // 8, tau, 3)
    for i in range(7):
        assert not np.allclose(shards[i], shards[i + 1]), \
            "adjacent device shards drew identical noise"


def test_launch_helpers_single_host():
    """Multi-host glue degrades cleanly to the single-process case."""
    import jax

    from mppi_tf_tpu.parallel import launch

    launch.initialize()  # no cluster metadata -> no-op
    mesh = launch.global_mesh(("k",))
    assert mesh.shape["k"] == len(jax.devices())
    mesh2 = launch.global_mesh(("dp", "tp"), (len(jax.devices()) // 2, 2))
    assert mesh2.shape["dp"] * mesh2.shape["tp"] == len(jax.devices())
    info = launch.process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] == len(jax.devices())
    import pytest

    with pytest.raises(ValueError):
        launch.global_mesh(("k",), (3,))


def test_sharded_filter_seq_equals_single_device():
    # Savitzky-Golay smoothing on the sharded path == single-device path
    # with the same injected noise (option parity: mppi.filter_seq).
    from mppi_tf_tpu.controller.mppi import savgol_matrix

    model, cost, sigma, lam, ups = _setup(tau=12)
    k, tau = 64, 12
    mesh = make_mesh()
    S = savgol_matrix(tau, 9, 3)
    _, sharded_with_noise = build_sharded_solve(
        model, cost, k, tau, lam, ups, sigma, mesh, filter_mat=S,
    )
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=lam, upsilon=ups, sigma=sigma,
                filter_seq=True, filter_window=9, filter_polyorder=3)

    rng = np.random.default_rng(7)
    eps = jnp.asarray(rng.normal(size=(k, tau, 3)) * 0.3)
    x0 = jnp.asarray(rng.normal(size=6))
    useq = jnp.asarray(rng.normal(size=(tau, 3)) * 0.1)

    a_s, u_s, _ = sharded_with_noise(
        eps, x0, useq, ctrl.model_params, ctrl._cparams)
    a_1, u_1, _ = ctrl._solve_with_noise_jit(
        eps, x0, useq, ctrl.model_params, ctrl._cparams)
    np.testing.assert_allclose(a_s, a_1, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(u_s, u_1, rtol=1e-10, atol=1e-14)


def test_sharded_controller_filter_seq_closed_loop():
    model, cost, sigma, lam, ups = _setup(tau=12)
    mesh = make_mesh()
    ctrl = ShardedMPPI(model, cost, mesh, k=64, tau=12, lam=lam,
                       upsilon=ups, sigma=sigma, filter_seq=True,
                       filter_window=9, filter_polyorder=3)
    x = np.zeros(6)
    p = ctrl.model_params if hasattr(ctrl, "model_params") else ctrl._mparams
    for _ in range(10):
        u = ctrl.next(x)
        x = np.asarray(model.predict(p, jnp.asarray(x), jnp.asarray(u))
                       ).reshape(-1)
    assert np.isfinite(x).all()


def test_get_controller_mesh_dispatch():
    # the factory returns a mesh-sharded controller when given a mesh
    from mppi_tf_tpu.controller import get_controller

    model, cost, sigma, lam, ups = _setup()
    mesh = make_mesh()
    cfg = {"samples": 64, "horizon": 8, "lambda": lam, "upsilon": ups,
           "noise": sigma.tolist()}
    ctrl = get_controller(model, cost, cfg, mesh=mesh)
    assert isinstance(ctrl, ShardedMPPI)  # CPU backend: XLA sharded path
    u = ctrl.next(np.zeros(6))
    assert u.shape == (3,)

    # filter/antithetic/normalize options pass through
    cfg2 = dict(cfg, filter=True, antithetic=True, normalize=True,
                horizon=12)
    ctrl2 = get_controller(model, cost, cfg2, mesh=mesh)
    assert isinstance(ctrl2, ShardedMPPI)
    u2 = ctrl2.next(np.zeros(6))
    assert np.isfinite(u2).all()


def test_get_controller_mesh_forwards_options(tmp_path):
    # observer/seed/init-act reach the sharded controller; explicit pallas
    # with incompatible options fails loudly
    import pytest

    from mppi_tf_tpu.controller import get_controller
    from mppi_tf_tpu.observer import Observer

    model, cost, sigma, lam, ups = _setup()
    mesh = make_mesh()
    cfg = {"samples": 64, "horizon": 8, "lambda": lam, "upsilon": ups,
           "noise": sigma.tolist(), "init-act": [0.5, 0.0, -0.5]}
    obs = Observer(log_path=str(tmp_path), use_tensorboard=False)
    ctrl = get_controller(model, cost, cfg, observer=obs, mesh=mesh, seed=7)
    np.testing.assert_allclose(np.asarray(ctrl.useq),
                               np.tile([0.5, 0.0, -0.5], (8, 1)))
    x = np.zeros(6)
    u = ctrl.next(x)
    ctrl.save(x, u, x)
    obs.close()
    import os
    text = open(os.path.join(obs.get_logdir(), "metrics.jsonl")).read()
    assert "Cost/cost_min" in text   # write_control reached the observer
    assert "Predict/" in text        # save() logged prediction error

    with pytest.raises(TypeError, match="pallas"):
        get_controller(model, cost, dict(cfg, kernel="pallas",
                                         normalize=True), mesh=mesh)


def test_get_model_auv_nn_default_action_dim():
    from mppi_tf_tpu.models import get_model

    m = get_model({"type": "auv_nn"}, dt=0.1)
    assert m.get_action_dim() == 6
    m2 = get_model({"type": "auv_nn_speed"}, dt=0.1)
    assert m2.get_action_dim() == 6
    m3 = get_model({"type": "point_mass"}, dt=0.1, state_dim=2)
    assert m3.get_action_dim() == 1


def test_sharded_save_load_resume_bit_exact(tmp_path):
    # §5.4 checkpoint/resume for the scale-out controller: resuming from a
    # checkpoint reproduces the uninterrupted run exactly
    model, cost, sigma, lam, ups = _setup()
    mesh = make_mesh()

    def make():
        return ShardedMPPI(model, cost, mesh, k=64, tau=8, lam=lam,
                           upsilon=ups, sigma=sigma, seed=3)

    a = make()
    for _ in range(4):
        a.next(np.zeros(6))
    ckpt = str(tmp_path / "sharded.npz")
    a.save_state(ckpt)
    cont_a = [a.next(np.zeros(6)) for _ in range(3)]

    b = make()
    b.load_state(ckpt)
    cont_b = [b.next(np.zeros(6)) for _ in range(3)]
    np.testing.assert_array_equal(np.asarray(cont_a), np.asarray(cont_b))

    c = ShardedMPPI(model, cost, mesh, k=64, tau=12, lam=lam,
                    upsilon=ups, sigma=sigma)
    import pytest
    with pytest.raises(ValueError):
        c.load_state(ckpt)

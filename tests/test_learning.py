"""Learner / replay-buffer / checkpoint tests.

Mirrors the reference's learning-loop coverage intent: stats -> normalizers,
training reduces loss, k-fold returns per-fold losses, validation rollouts,
checkpoint round trip (learner_base.py throughout).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mppi_tf_tpu.learning.learner import Learner
from mppi_tf_tpu.learning.replay import ReplayBuffer
from mppi_tf_tpu.models.nn import NNModel
from mppi_tf_tpu.models.point_mass import PointMassModel


def _fill_learner(learner, n=64, seed=40):
    """Populate the buffer with point-mass transitions (mass=2)."""
    rng = np.random.default_rng(seed)
    model = PointMassModel(mass=2.0, dt=0.1, state_dim=2, action_dim=1,
                           dtype=jnp.float64)
    p = model.init_params()
    for _ in range(n):
        x = rng.normal(size=2)
        u = rng.normal(size=1)
        x1 = np.asarray(model.predict(p, jnp.asarray(x), jnp.asarray(u)))
        learner.add_rb(x, u, x1)
    return model, p


class TestReplayBuffer:
    @pytest.mark.parametrize("use_native", [False, True])
    def test_ring_semantics(self, use_native):
        rb = ReplayBuffer(4, 2, 1, use_native=use_native)
        for i in range(6):
            rb.add([i, i], [i], [i + 1, i + 1])
        assert len(rb) == 4
        data = rb.get_all_transitions()
        np.testing.assert_allclose(data["obs"][:, 0], [2, 3, 4, 5])

    def test_csv_round_trip(self, tmp_path):
        rb = ReplayBuffer(8, 2, 1, use_native=False)
        rng = np.random.default_rng(41)
        for _ in range(5):
            rb.add(rng.normal(size=2), rng.normal(size=1),
                   rng.normal(size=2))
        path = str(tmp_path / "transitions.csv")
        rb.save_transitions(path)
        rb2 = ReplayBuffer(8, 2, 1, use_native=False)
        rb2.load_transitions(path)
        d1, d2 = rb.get_all_transitions(), rb2.get_all_transitions()
        for k in d1:
            np.testing.assert_allclose(d1[k], d2[k], rtol=1e-12)

    def test_native_csv_matches_python_csv(self, tmp_path):
        pytest.importorskip("mppi_tf_tpu.learning.datastore")
        from mppi_tf_tpu.learning.datastore import NativeDataStore

        ds = NativeDataStore(8, 2, 1)
        rng = np.random.default_rng(42)
        rows = [(rng.normal(size=2), rng.normal(size=1), rng.normal(size=2))
                for _ in range(5)]
        for o, a, n in rows:
            ds.add(o, a, n)
        path = str(tmp_path / "native.csv")
        ds.to_csv(path)
        loaded = np.loadtxt(path, delimiter=",", skiprows=1, ndmin=2)
        np.testing.assert_allclose(loaded[:, :2],
                                   np.stack([r[0] for r in rows]), rtol=1e-12)

    def test_sample(self):
        rb = ReplayBuffer(16, 2, 1, use_native=False)
        for i in range(10):
            rb.add([i, 0], [0], [0, 0])
        batch = rb.sample(32, rng=np.random.default_rng(0))
        assert batch["obs"].shape == (32, 2)
        assert batch["obs"][:, 0].max() <= 9


class TestLearner:
    def _mk(self, **kw):
        model = NNModel(state_dim=2, action_dim=1, hidden=(32, 32),
                        dtype=jnp.float64)
        return Learner(model, buffer_size=256, num_epochs=60,
                       learning_rate=5e-3, **kw)

    def test_stats_sets_normalizers(self):
        learner = self._mk()
        _fill_learner(learner)
        learner.stats()
        assert not np.allclose(np.asarray(learner.params["x_mean"]), 0.0)
        assert np.all(np.asarray(learner.params["x_std"]) > 0)

    def test_training_reduces_loss(self):
        learner = self._mk()
        _fill_learner(learner, n=128)
        learner.stats()
        data = learner.rb_trans()
        X, Y = learner._prepare(data)
        l0 = float(learner._loss(learner.model.trainable(learner.params), X, Y))
        learner.train_all(epoch=200, augment=False)
        l1 = float(learner._loss(learner.model.trainable(learner.params), X, Y))
        assert l1 < 0.2 * l0, f"loss did not drop enough: {l0} -> {l1}"

    def test_kfold_returns_per_fold_losses(self):
        learner = self._mk()
        _fill_learner(learner, n=64)
        learner.stats()
        train_l, test_l = learner.k_fold_validation(k=4, epoch=20)
        assert train_l.shape == (4,)
        assert test_l.shape == (4,)
        assert np.all(np.isfinite(train_l))

    def test_validate_open_loop(self):
        learner = self._mk()
        model, p = _fill_learner(learner, n=64)
        learner.stats()
        # ground-truth trajectories from the true plant
        rng = np.random.default_rng(43)
        k, tau = 3, 10
        seqs = rng.normal(size=(k, tau, 1))
        trajs = np.asarray(model.run_model(
            p, jnp.asarray(rng.normal(size=(k, 2))), jnp.asarray(seqs)))
        err_before = float(learner.validate(seqs, trajs[:, :tau]))
        learner.train_all(epoch=300, augment=False)
        err_after = float(learner.validate(seqs, trajs[:, :tau]))
        assert err_after < err_before

    def test_augment_data_shapes(self):
        import jax

        learner = self._mk()
        X = jnp.ones((4, 3))
        Y = jnp.ones((4, 2))
        Xa, Ya = learner.augment_data(jax.random.PRNGKey(0), X, Y,
                                      samples=5, sigma=0.01)
        assert Xa.shape == (20, 3)
        assert Ya.shape == (20, 2)
        assert not np.allclose(np.asarray(Xa[:5]), 1.0)  # noise applied

    def test_checkpoint_round_trip(self, tmp_path):
        learner = self._mk(log_path=str(tmp_path))
        learner.logdir = str(tmp_path)
        _fill_learner(learner, n=32)
        learner.stats()
        path = learner.save_params(7)
        params_before = learner.params
        # perturb, then restore
        import jax

        learner.params = jax.tree.map(lambda x: x + 1.0, learner.params)
        learner.load_params(path)
        for a, b in zip(jax.tree.leaves(params_before),
                        jax.tree.leaves(learner.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        from mppi_tf_tpu.learning.checkpoint import latest_checkpoint

        found = latest_checkpoint(str(tmp_path))
        assert found is not None and "weights_step7" in found

    def test_grid_search_returns_best(self):
        learner = self._mk()
        model, p = _fill_learner(learner, n=48)
        rng = np.random.default_rng(44)
        seqs = rng.normal(size=(2, 6, 1))
        trajs = np.asarray(model.run_model(
            p, jnp.asarray(rng.normal(size=(2, 2))), jnp.asarray(seqs)))
        best, results = learner.grid_search(
            trajs[:, :6], seqs, learning_rates=[1e-3, 1e-2],
            sigmas=[0.001], epochs=(10,), k=2)
        assert len(results) == 2
        assert best["val_error"] == min(r["val_error"] for r in results)


def test_collect_transitions_random_policy():
    """Reference save_rng_sim.py equivalent: random-action collection."""
    import numpy as np
    from mppi_tf_tpu.collect import collect_transitions
    from mppi_tf_tpu.envs import get_env
    from mppi_tf_tpu.learning.replay import ReplayBuffer

    env_cfg = {"env": "analytic:point_mass", "state-dim": 6, "action-dim": 3,
               "dt": 0.1, "max-a": [1.0, 1.0, 1.0]}
    env = get_env(env_cfg, render=False)
    buf = ReplayBuffer(64, 6, 3)
    collect_transitions(env, buf, 20, 3, -1.0, 1.0, seed=1, control_dt=0.1)
    assert len(buf) == 20
    data = buf.get_all_transitions()
    assert data["obs"].shape == (20, 6)
    assert np.all(np.abs(data["act"]) <= 1.0)
    # transitions must chain: next_obs[i] == obs[i+1]
    np.testing.assert_allclose(data["next_obs"][:-1], data["obs"][1:])

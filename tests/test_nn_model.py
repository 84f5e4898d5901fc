"""NN dynamics model tests.

Mirrors the reference TestNNAUVModel strategy (scripts/test.py:587-684):
data-preparation round trips (body-frame delta targets), plus forward-pass
shape/consistency checks and a learning smoke test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_tf_tpu.models.nn import (
    NNAUVModel,
    NNAUVModelSpeed,
    NNModel,
    mlp_apply,
    mlp_init,
)
from mppi_tf_tpu.ops import quaternion as quat


def _rand_auv_state(rng, k):
    x = rng.normal(size=(k, 13))
    x[:, 3:7] /= np.linalg.norm(x[:, 3:7], axis=-1, keepdims=True)
    return x


class TestMLP:
    def test_shapes(self):
        params = mlp_init(jax.random.PRNGKey(0), [7, 32, 32, 32, 4],
                          dtype=jnp.float64)
        x = jnp.ones((5, 7))
        y = mlp_apply(params, x)
        assert y.shape == (5, 4)

    def test_relu_nonlinearity(self):
        params = mlp_init(jax.random.PRNGKey(1), [2, 8, 1], dtype=jnp.float64)
        x1 = jnp.asarray([[1.0, 2.0]])
        # ReLU is positively homogeneous, so test with negation: a linear
        # net satisfies y(-x) == -y(x); ReLU breaks it.
        y_neg = mlp_apply(params, -x1)
        y_pos = mlp_apply(params, x1)
        assert not np.allclose(np.asarray(y_neg), -np.asarray(y_pos))


class TestNNModel:
    def test_step_shape_and_norm_identity(self):
        model = NNModel(state_dim=4, action_dim=2, dtype=jnp.float64)
        params = model.init_params()
        x = jnp.ones((3, 4))
        u = jnp.ones((3, 2))
        nxt = model.step(params, x, u)
        assert nxt.shape == (3, 4)

    def test_normalization_round_trip(self):
        model = NNModel(state_dim=4, action_dim=2, dtype=jnp.float64)
        params = model.init_params()
        params = model.set_normalization(
            params, x_mean=np.arange(6.0), x_std=np.arange(1.0, 7.0),
            y_mean=np.ones(4), y_std=2.0 * np.ones(4))
        rng = np.random.default_rng(20)
        feats = jnp.asarray(rng.normal(size=(5, 6)))
        back = model.denormalize_x(params, model.normalize_x(params, feats))
        np.testing.assert_allclose(back, feats, rtol=1e-12)
        y = jnp.asarray(rng.normal(size=(5, 4)))
        np.testing.assert_allclose(
            model.denormalize_y(params, (y - params["y_mean"]) / params["y_std"]),
            y, rtol=1e-12)

    def test_learns_linear_map(self):
        """The MLP fits a small linear system from transition data."""
        import optax

        model = NNModel(state_dim=2, action_dim=1, hidden=(32, 32),
                        dtype=jnp.float64)
        params = model.init_params()
        rng = np.random.default_rng(21)
        A = np.array([[1.0, 0.1], [0.0, 1.0]])
        B = np.array([[0.005], [0.1]])
        x = rng.normal(size=(256, 2))
        u = rng.normal(size=(256, 1))
        x1 = x @ A.T + u @ B.T
        X, Y = model.prepare_training_data(
            params, jnp.asarray(x), jnp.asarray(x1), jnp.asarray(u))

        opt = optax.adam(1e-2)
        net = model.trainable(params)
        state = opt.init(net)

        @jax.jit
        def step(net, state):
            def loss(n):
                p = model.with_trainable(params, n)
                return jnp.mean((model.predict_nn(p, X) - Y) ** 2)

            l, g = jax.value_and_grad(loss)(net)
            upd, state2 = opt.update(g, state)
            return optax.apply_updates(net, upd), state2, l

        for _ in range(500):
            net, state, l = step(net, state)
        assert float(l) < 1e-3, f"did not fit linear map: loss={float(l)}"


class TestNNAUVModel:
    def test_feature_translation_invariance(self):
        """Inputs must not depend on absolute position (nn_model.py:194-197)."""
        model = NNAUVModel(dtype=jnp.float64)
        rng = np.random.default_rng(22)
        x = _rand_auv_state(rng, 4)
        u = rng.normal(size=(4, 6))
        f1 = model.features(jnp.asarray(x), jnp.asarray(u))
        x_shift = x.copy()
        x_shift[:, :3] += 100.0
        f2 = model.features(jnp.asarray(x_shift), jnp.asarray(u))
        np.testing.assert_allclose(f1, f2, rtol=1e-12)

    def test_prepare_training_data_targets_are_deltas(self):
        """Reference nn_model.py:241-287: Y reduces to stateT1 - stateT."""
        model = NNAUVModel(dtype=jnp.float64)
        params = model.init_params()
        rng = np.random.default_rng(23)
        x = _rand_auv_state(rng, 5)
        x1 = _rand_auv_state(rng, 5)
        u = rng.normal(size=(5, 6))
        X, Y = model.prepare_training_data(
            params, jnp.asarray(x), jnp.asarray(x1), jnp.asarray(u),
            norm=False)
        np.testing.assert_allclose(Y, x1 - x, rtol=1e-12)
        assert X.shape == (5, 16)

    def test_step_consistency_with_training_target(self):
        """step() must invert prepare_training_data: feeding the network's
        own normalized prediction as target reproduces the step output."""
        model = NNAUVModel(dtype=jnp.float64)
        params = model.init_params()
        rng = np.random.default_rng(24)
        x = jnp.asarray(_rand_auv_state(rng, 3))
        u = jnp.asarray(rng.normal(size=(3, 6)))
        nxt = model.step(params, x, u)
        feats = model.normalize_x(params, model.features(x, u))
        delta = model.denormalize_y(params, model.predict_nn(params, feats))
        expect = np.array(x + delta)  # writable copy
        # step() renormalises the quaternion block (documented deviation
        # from the reference's raw sum — |q| must not drift over rollouts)
        expect[:, 3:7] /= np.linalg.norm(expect[:, 3:7], axis=1,
                                         keepdims=True)
        np.testing.assert_allclose(nxt, expect, rtol=1e-12)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(nxt)[:, 3:7], axis=1), 1.0,
            rtol=1e-12)


class TestNNAUVModelSpeed:
    def test_output_is_velocity_only(self):
        model = NNAUVModelSpeed(dtype=jnp.float64)
        assert model.output_dim() == 6
        assert model.input_dim() == 15

    def test_pose_advanced_analytically(self):
        """With a zero-output network the pose still integrates kinematics
        (nn_model.py:464-471)."""
        model = NNAUVModelSpeed(dtype=jnp.float64)
        params = model.init_params()
        # zero the last layer so delta == 0
        params["net"][-1]["w"] = jnp.zeros_like(params["net"][-1]["w"])
        params["net"][-1]["b"] = jnp.zeros_like(params["net"][-1]["b"])
        x = np.zeros((1, 13))
        x[0, 6] = 1.0  # identity quat
        x[0, 7] = 2.0  # surge velocity
        nxt = np.asarray(model.step(params, jnp.asarray(x),
                                    jnp.zeros((1, 6))))
        # position advances by R @ v * dt = [0.2, 0, 0]
        np.testing.assert_allclose(nxt[0, :3], [0.2, 0.0, 0.0], atol=1e-12)
        # velocity unchanged (delta == 0)
        np.testing.assert_allclose(nxt[0, 7:], x[0, 7:], atol=1e-12)
        np.testing.assert_allclose(np.linalg.norm(nxt[0, 3:7]), 1.0,
                                   rtol=1e-12)

    def test_euler_encoding(self):
        model = NNAUVModelSpeed(dtype=jnp.float64)
        rng = np.random.default_rng(25)
        x = _rand_auv_state(rng, 4)
        xe = np.asarray(model.to_euler_state(jnp.asarray(x)))
        assert xe.shape == (4, 12)
        # euler angles recover the same rotation matrix
        from scipy.spatial.transform import Rotation

        for i in range(4):
            R_expected = Rotation.from_quat(x[i, 3:7]).as_matrix()
            R_euler = Rotation.from_euler("xyz", xe[i, 3:6]).as_matrix()
            np.testing.assert_allclose(R_euler, R_expected, atol=1e-9)

    def test_training_targets_velocity_deltas(self):
        model = NNAUVModelSpeed(dtype=jnp.float64)
        params = model.init_params()
        rng = np.random.default_rng(26)
        x = _rand_auv_state(rng, 5)
        x1 = _rand_auv_state(rng, 5)
        u = rng.normal(size=(5, 6))
        X, Y = model.prepare_training_data(
            params, jnp.asarray(x), jnp.asarray(x1), jnp.asarray(u),
            norm=False)
        np.testing.assert_allclose(Y, x1[:, 7:] - x[:, 7:], rtol=1e-12)
        assert X.shape == (5, 15)

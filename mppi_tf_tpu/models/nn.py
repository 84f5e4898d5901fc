"""Learned neural-network dynamics models.

Reference: scripts/src/models/nn_model.py — three families:

- ``NNModel`` (:20-175): generic MLP 3x32 ReLU -> sDim linear predicting the
  next-state delta from normalized [state-features, action]; X/Y mean-std
  normalization; weight save/load.
- ``NNAUVModel`` (:179-304): AUV-specific — predicts the 13-dim delta-state
  in the previous-state body frame from [state[3:], action] normalized, with
  the position masked out of the input for translation invariance.
- ``NNAUVModelSpeed`` (:307-588): predicts only the 6 velocity deltas; the
  pose is advanced analytically through the quaternion Jacobian; inputs use
  a euler-angle encoding (quat -> euler).

TPU-first design: parameters are explicit pytrees (no Keras / tf.Variable),
the forward pass is a pure function usable inside the rollout ``lax.scan``
and under ``vmap``/``shard_map``; weights are checkpointed with Orbax
(learning/checkpoint.py) instead of Keras SavedModel. The hidden layers are
kept as [in, 32] x [32, 32] x [32, out] matmuls — batched over K they map
straight onto the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat
from .base import ModelBase


def mlp_init(key, sizes: Sequence[int], dtype=jnp.float32):
    """He-initialised MLP parameter pytree: list of {w, b} per layer."""
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for k, (fan_in, fan_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
        w = jax.random.normal(k, (fan_in, fan_out), dtype=dtype)
        w = w * jnp.sqrt(2.0 / fan_in).astype(dtype)
        params.append({"w": w, "b": jnp.zeros((fan_out,), dtype=dtype)})
    return params


def mlp_apply(layers, x: jax.Array, compute_dtype=None) -> jax.Array:
    """ReLU MLP forward pass; final layer linear. x: [k, in] -> [k, out].

    Mirrors the reference network topology (nn_model.py:54-60).
    ``compute_dtype=jnp.bfloat16`` runs the matmuls at bf16 MXU rate with
    f32 accumulation (``preferred_element_type``) — the rollout sampling
    path tolerates bf16 inputs; training keeps full precision.
    """
    acc = x.dtype
    cd = compute_dtype if compute_dtype is not None else acc
    h = x
    for layer in layers[:-1]:
        h = jnp.maximum(
            jnp.dot(h.astype(cd), layer["w"].astype(cd),
                    preferred_element_type=acc) + layer["b"],
            0.0,
        )
    last = layers[-1]
    return (jnp.dot(h.astype(cd), last["w"].astype(cd),
                    preferred_element_type=acc) + last["b"])


class NNModel(ModelBase):
    """Generic learned dynamics: MLP predicting normalized next-state delta.

    Reference: nn_model.py:20-175. Input features are [state, action]
    (for the generic model the full state is used); the network output is a
    normalized delta added to the current state.
    """

    def __init__(
        self,
        state_dim: int = 2,
        action_dim: int = 1,
        dt: float = 0.1,
        hidden: Sequence[int] = (32, 32, 32),
        name: str = "nn_model",
        act_max=None,
        act_min=None,
        seed: int = 0,
        dtype=jnp.float32,
        compute_dtype=None,
    ):
        super().__init__(state_dim, action_dim, dt=dt, name=name,
                         act_max=act_max, act_min=act_min, dtype=dtype)
        self._hidden = tuple(hidden)
        self._seed = seed
        # bf16 matmul rate for the rollout sampling path (f32 accumulate)
        self._compute_dtype = compute_dtype

    # --- feature/topology hooks (overridden by the AUV variants) --------
    def input_dim(self) -> int:
        return self._state_dim + self._action_dim

    def output_dim(self) -> int:
        return self._state_dim

    def features(self, x: jax.Array, u: jax.Array) -> jax.Array:
        """Raw (un-normalized) network input. [k,sDim],[k,aDim] -> [k,in]."""
        return jnp.concatenate([x, u], axis=-1)

    def apply_delta(self, mp, x: jax.Array, delta: jax.Array) -> jax.Array:
        """next_state from the denormalized delta. Reference: nn_model.py:303-304."""
        return x + delta

    # --- params ----------------------------------------------------------
    def init_params(self):
        """Network weights + normalization statistics.

        The reference stores X/Y mean-std on the model object
        (nn_model.py:65-99 set_Xmean_Xstd/set_Ymean_Ystd); here they are part
        of the params pytree so a checkpoint is self-contained.
        """
        sizes = [self.input_dim(), *self._hidden, self.output_dim()]
        return {
            "net": mlp_init(jax.random.PRNGKey(self._seed), sizes,
                            dtype=self._dtype),
            "x_mean": jnp.zeros((self.input_dim(),), dtype=self._dtype),
            "x_std": jnp.ones((self.input_dim(),), dtype=self._dtype),
            "y_mean": jnp.zeros((self.output_dim(),), dtype=self._dtype),
            "y_std": jnp.ones((self.output_dim(),), dtype=self._dtype),
        }

    def set_normalization(self, params, x_mean, x_std, y_mean, y_std):
        """Functional update of the normalizers (learner's ``stats()``)."""
        cast = lambda v: jnp.asarray(v, dtype=self._dtype).reshape(-1)
        return {
            **params,
            "x_mean": cast(x_mean), "x_std": cast(x_std),
            "y_mean": cast(y_mean), "y_std": cast(y_std),
        }

    # --- forward ----------------------------------------------------------
    def normalize_x(self, params, feats):
        return (feats - params["x_mean"]) / params["x_std"]

    def denormalize_x(self, params, feats_norm):
        """Reference: nn_model.py:299-301."""
        return feats_norm * params["x_std"] + params["x_mean"]

    def denormalize_y(self, params, y_norm):
        """Reference: nn_model.py:295-297."""
        return y_norm * params["y_std"] + params["y_mean"]

    def predict_nn(self, params, feats_norm: jax.Array,
                   training: bool = False) -> jax.Array:
        """Normalized-space network forward. Reference: nn_model.py:174-175.

        ``training=True`` (the Learner's loss path) always runs at full
        precision; compute_dtype only downcasts the rollout sampling path.
        """
        cd = None if training else self._compute_dtype
        return mlp_apply(params["net"], feats_norm, compute_dtype=cd)

    def step(self, params, x: jax.Array, u: jax.Array) -> jax.Array:
        """x_next = apply_delta(x, denorm(net(norm(features(x, u))))).

        Reference: nn_model.py:215-239 (NNAUVModel.build_step_graph shape).
        """
        feats = self.normalize_x(params, self.features(x, u))
        delta = self.denormalize_y(params, self.predict_nn(params, feats))
        return self.apply_delta(params, x, delta)

    # --- training-data preparation ----------------------------------------
    def prepare_training_data(self, params, x_t, x_t1, u_t, norm: bool = True):
        """(X, Y) pairs for supervised learning. Default: delta targets.

        Reference: nn_model.py:241-287 (AUV variant overrides).
        """
        X = self.features(x_t, u_t)
        Y = x_t1 - x_t
        if norm:
            X = self.normalize_x(params, X)
            Y = (Y - params["y_mean"]) / params["y_std"]
        return X, Y

    def trainable(self, params):
        """The sub-pytree gradients flow through (network only)."""
        return params["net"]

    def with_trainable(self, params, net):
        return {**params, "net": net}

    def trainable_init(self, key):
        """Fresh He-initialised weights — per-fold clones get independent
        inits like the reference's ``copy_model`` (scripts/src/model.py:70-78)."""
        sizes = [self.input_dim(), *self._hidden, self.output_dim()]
        return mlp_init(key, sizes, dtype=self._dtype)


# position mask: inputs exclude the absolute position for translation
# invariance (reference nn_model.py:194-197 mask).
_POS = slice(0, 3)


class NNAUVModel(NNModel):
    """AUV NN model: body-frame delta-state prediction.

    State is the 13-dim quaternion AUV state. The network sees
    [state[3:], action] (position dropped — translation invariance) and
    predicts the full 13-dim delta in the frame anchored at the previous
    position. Reference: nn_model.py:179-304.
    """

    STATE_DIM = 13

    def __init__(self, action_dim: int = 6, dt: float = 0.1,
                 hidden: Sequence[int] = (32, 32, 32),
                 name: str = "auv_nn_model", seed: int = 0,
                 act_max=None, act_min=None, dtype=jnp.float32,
                 compute_dtype=None):
        super().__init__(state_dim=self.STATE_DIM, action_dim=action_dim,
                         dt=dt, hidden=hidden, name=name, seed=seed,
                         act_max=act_max, act_min=act_min, dtype=dtype,
                         compute_dtype=compute_dtype)

    def input_dim(self) -> int:
        # state minus position (13-3=10) + action
        return self.STATE_DIM - 3 + self._action_dim

    def output_dim(self) -> int:
        return self.STATE_DIM

    def features(self, x, u):
        """[state[3:], action]. Reference: nn_model.py:289-293."""
        return jnp.concatenate([x[:, 3:], u], axis=-1)

    #: renormalise the quaternion block after adding the predicted delta.
    #: DOCUMENTED DEVIATION from the reference (nn_model.py:303-304
    #: returns the raw sum): without it |q| drifts from 1 over a tau-step
    #: rollout as unnormalised network deltas accumulate, and every
    #: quaternion consumer (rotation matrices, attitude costs) silently
    #: picks up a |q|^2 scale — the same reason AUVModel.step and
    #: NNAUVModelSpeed.apply_delta normalise (review finding). The
    #: reference-parity oracle sets this False to pin the raw algebra.
    renormalize_quat: bool = True

    def apply_delta(self, mp, x: jax.Array, delta: jax.Array) -> jax.Array:
        """x + delta, quaternion renormalised (see renormalize_quat)."""
        out = x + delta
        if not self.renormalize_quat:
            return out
        q = quat.normalize(out[:, 3:7])
        return jnp.concatenate([out[:, :3], q, out[:, 7:]], axis=-1)

    def prepare_training_data(self, params, x_t, x_t1, u_t, norm: bool = True):
        """Delta targets. Reference: nn_model.py:241-287 — its body-frame
        anchoring (``tFrom = mask*stateT``) cancels algebraically:
        ``(stateT1 - tFrom) - (stateT - tFrom) = stateT1 - stateT``, so
        the target IS the plain delta (the base-class rule)."""
        X = self.features(x_t, u_t)
        Y = x_t1 - x_t
        if norm:
            X = self.normalize_x(params, X)
            Y = (Y - params["y_mean"]) / params["y_std"]
        return X, Y


class NNAUVModelSpeed(NNAUVModel):
    """AUV NN model predicting only velocity deltas; pose advanced
    analytically via the quaternion Jacobian.

    Inputs use the euler-angle state encoding (12-dim state rep minus
    position = 9 features, + action). Reference: nn_model.py:307-588.
    """

    def __init__(self, action_dim: int = 6, dt: float = 0.1,
                 hidden: Sequence[int] = (16, 16, 16),
                 name: str = "auv_nn_speed_model", seed: int = 0,
                 act_max=None, act_min=None, dtype=jnp.float32,
                 compute_dtype=None):
        super().__init__(action_dim=action_dim, dt=dt, hidden=hidden,
                         name=name, seed=seed, act_max=act_max,
                         act_min=act_min, dtype=dtype,
                         compute_dtype=compute_dtype)

    def input_dim(self) -> int:
        # euler state (12) minus position (3) = 9, + action
        # (reference nn_model.py:349-353: stateDim + aDim - 3 - 1)
        return 12 - 3 + self._action_dim

    def output_dim(self) -> int:
        return 6  # velocity deltas only (nn_model.py:343)

    def to_euler_state(self, x: jax.Array) -> jax.Array:
        """13-dim quat state -> 12-dim euler state. Reference: nn_model.py:564-588."""
        euler = quat.to_euler(x[:, 3:7])
        return jnp.concatenate([x[:, :3], euler, x[:, 7:]], axis=-1)

    def features(self, x, u):
        """[euler_state[3:], action]. Reference: nn_model.py:438-462."""
        xe = self.to_euler_state(x)
        return jnp.concatenate([xe[:, 3:], u], axis=-1)

    def apply_delta(self, params, x, delta):
        """Advance pose analytically (q_dot = J(q) nu), add delta to velocity.

        Reference: nn_model.py:464-471 (next_state).
        """
        q = x[:, 3:7]
        vel = x[:, 7:13]
        rot = quat.to_rotation_matrix(q)
        tq = quat.attitude_jacobian(q)
        pos_dot = jnp.einsum("kij,kj->ki", rot, vel[:, :3])
        quat_dot = jnp.einsum("kij,kj->ki", tq, vel[:, 3:6])
        next_pos = x[:, :3] + pos_dot * self._dt
        next_q = quat.normalize(q + quat_dot * self._dt)
        next_vel = vel + delta
        return jnp.concatenate([next_pos, next_q, next_vel], axis=-1)

    def prepare_training_data(self, params, x_t, x_t1, u_t, norm: bool = True):
        """X from euler encoding; Y = velocity delta only.

        Reference: nn_model.py:384-436.
        """
        X = self.features(x_t, u_t)
        Y = x_t1[:, 7:13] - x_t[:, 7:13]
        if norm:
            X = self.normalize_x(params, X)
            Y = (Y - params["y_mean"]) / params["y_std"]
        return X, Y

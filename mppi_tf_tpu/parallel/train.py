"""Mesh-sharded training step for learned dynamics models.

Greenfield TPU-native equivalent of the reference's single-device learner
step (scripts/src/learners/learner_base.py:469-496 ``_train_step``): MSE on
normalized targets, Adam — but jitted over a 2-D ('dp', 'tp') device mesh:

- the transition batch is sharded over 'dp' (data parallel);
- the MLP's hidden dimension is sharded over 'tp' (tensor parallel): layer i
  weights [in, h] are sharded on the output feature axis, layer i+1 [h, out]
  on the input feature axis, so XLA/GSPMD inserts a single psum per pair of
  layers — the Megatron column/row-parallel pattern expressed purely through
  sharding annotations.

Gradients reduce over 'dp' automatically (XLA inserts the psum for the mean
loss). No manual collectives anywhere — this is the "annotate shardings, let
XLA insert collectives" recipe.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mlp_param_specs(net_params, tp_axis: str = "tp"):
    """Column/row-parallel PartitionSpecs for an MLP parameter list.

    Alternating layers shard weights on the output / input feature axis so
    activations stay sharded on the hidden axis between them.
    """
    specs = []
    for i, _layer in enumerate(net_params):
        if i % 2 == 0:  # column parallel: shard output features
            specs.append({"w": P(None, tp_axis), "b": P(tp_axis)})
        else:  # row parallel: shard input features
            specs.append({"w": P(tp_axis, None), "b": P()})
    return specs


def model_param_specs(params: Any, tp_axis: str = "tp"):
    """PartitionSpecs for a full NN-model params pytree (net + normalizers)."""
    specs = {k: jax.tree.map(lambda _: P(), v)
             for k, v in params.items() if k != "net"}
    specs["net"] = mlp_param_specs(params["net"], tp_axis)
    return specs


def make_sharded_train_step(
    model,
    mesh: Mesh,
    learning_rate: float = 1e-3,
    dp_axis: str = "dp",
    tp_axis: str = "tp",
):
    """Build (init_fn, train_step) jitted over ``mesh``.

    train_step(params, opt_state, X, Y) -> (params, opt_state, loss) where
    X: [batch, in], Y: [batch, out] are normalized training pairs
    (model.prepare_training_data output).
    """
    opt = optax.adam(learning_rate)

    def loss_fn(net, params, X, Y):
        p = model.with_trainable(params, net)
        pred = model.predict_nn(p, X, training=True)
        return jnp.mean((pred - Y) ** 2)

    def train_step(params, opt_state, X, Y):
        net = model.trainable(params)
        loss, grads = jax.value_and_grad(loss_fn)(net, params, X, Y)
        updates, opt_state = opt.update(grads, opt_state)
        net = optax.apply_updates(net, updates)
        return model.with_trainable(params, net), opt_state, loss

    def shardings(params):
        pspecs = model_param_specs(params, tp_axis)
        to_sharding = lambda spec: jax.tree.map(
            lambda s: NamedSharding(mesh, s), spec,
            is_leaf=lambda x: isinstance(x, P),
        )
        param_sh = to_sharding(pspecs)
        net_sh = param_sh["net"]
        batch_sh = NamedSharding(mesh, P(dp_axis))
        return param_sh, net_sh, batch_sh

    def init(params):
        """Place params/opt_state on the mesh with TP shardings."""
        param_sh, net_sh, _ = shardings(params)
        params = jax.device_put(params, param_sh)
        opt_state = opt.init(model.trainable(params))
        return params, opt_state

    def place_batch(X, Y):
        """Shard a training batch over the dp axis."""
        batch_sh = NamedSharding(mesh, P(dp_axis))
        return jax.device_put(X, batch_sh), jax.device_put(Y, batch_sh)

    def jit_step(params):
        param_sh, net_sh, batch_sh = shardings(params)
        opt_sh = jax.tree.map(
            lambda _: NamedSharding(mesh, P()), opt.init(model.trainable(params)),
        )
        # opt state for weights mirrors the weight shardings (adam moments)
        opt_sh = _adam_state_shardings(opt, model.trainable(params), net_sh, mesh)
        return jax.jit(
            train_step,
            in_shardings=(param_sh, opt_sh, batch_sh, batch_sh),
            out_shardings=(param_sh, opt_sh, NamedSharding(mesh, P())),
        )

    return init, jit_step, place_batch


def _adam_state_shardings(opt, net_params, net_sh, mesh):
    """Shard Adam's mu/nu moments like the weights they track."""
    state = opt.init(net_params)

    def map_state(s):
        if hasattr(s, "mu"):
            rep = jax.tree.map(lambda _: NamedSharding(mesh, P()), s.count)
            return s._replace(count=rep, mu=net_sh, nu=net_sh)
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), s)

    return tuple(map_state(s) for s in state)

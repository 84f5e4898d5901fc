"""The MPPI update law as pure, individually-testable functions.

Information-theoretic MPPI (Williams et al.): given per-sample rollout costs
``S_k`` and the noise realisations ``eps_k`` that produced them, compute

    beta   = min_k S_k
    arg_k  = (S_k - beta)            (optionally / max_k (S_k - beta))
    w_k    = exp(-arg_k / lambda) / sum_j exp(-arg_j / lambda)
    U     += sum_k w_k * eps_k

The decomposition into tiny ops mirrors the reference's deliberately testable
structure (reference: scripts/src/controllers/controller_base.py:464-498,
src/controller_base.cpp:166-224; the decomposition-for-testing intent is
recorded in TODO.md:17). Shapes here are flat/TPU-friendly: costs ``[k]``,
noise ``[k, tau, aDim]`` — the reference's trailing singleton dims
([k,1,1], [k,tau,aDim,1]) are TF graph artifacts and are dropped.

Every function optionally takes an ``axis_name``: inside a ``shard_map`` over
a device mesh the per-device partial reductions are combined with
``pmin``/``pmax``/``psum`` over the ``k`` mesh axis — the complete set of
collectives the update law needs (see SURVEY.md §2.8/§5.8). Outside a mesh
(``axis_name=None``) they are plain single-device reductions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def beta(costs: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
    """Minimum cost over samples. costs: [k] -> scalar.

    Reference: controller_base.py:464-466 (``tf.reduce_min(cost, 0)``);
    C++ src/controller_base.cpp:166-171.
    """
    b = jnp.min(costs, axis=0)
    if axis_name is not None:
        b = jax.lax.pmin(b, axis_name)
    return b


def norm_arg(
    costs: jax.Array,
    beta_val: jax.Array,
    normalize: bool = False,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Shift costs by beta, optionally normalize by the max shifted cost.

    costs: [k] -> [k]. Normalization simplifies tuning of lambda and is
    load-bearing for exp stability at large K in f32.
    Reference: controller_base.py:468-474.
    """
    shifted = costs - beta_val
    if normalize:
        m = jnp.max(shifted, axis=0)
        if axis_name is not None:
            m = jax.lax.pmax(m, axis_name)
        # all-equal costs (zero sigma, saturated f32 costs) give m == 0;
        # dividing would produce NaN weights downstream. Matches the native
        # core's guard (native/src/mppi_core.cpp mppi_update: denom = m > 0 ?
        # m : 1) — with all costs equal the weights are uniform either way.
        m = jnp.where(m > 0, m, jnp.ones_like(m))
        shifted = shifted / m
    return shifted


def exp_arg(arg: jax.Array, lam) -> jax.Array:
    """Multiply by -1/lambda. [k] -> [k]. Reference: controller_base.py:476-478."""
    return (-1.0 / lam) * arg


def exp(arg: jax.Array) -> jax.Array:
    """Elementwise exponential. Reference: controller_base.py:480-482."""
    return jnp.exp(arg)


def nabla(e: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
    """Normalizer: sum over samples of the exponentiated costs. [k] -> scalar.

    Reference: controller_base.py:484-486. Under a mesh this is the psum
    that makes the softmax global across shards.
    """
    n = jnp.sum(e, axis=0)
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
    return n


def weights(e: jax.Array, nabla_val: jax.Array) -> jax.Array:
    """Per-sample softmax weights. [k], scalar -> [k].

    Reference: controller_base.py:488-490.
    """
    return e / nabla_val


def weighted_noise(
    w: jax.Array, noises: jax.Array, axis_name: Optional[str] = None
) -> jax.Array:
    """Weight-averaged noise: sum_k w_k * eps_k.

    w: [k], noises: [k, tau, aDim] -> [tau, aDim].
    Reference: controller_base.py:492-498. Implemented as a single
    contraction over k so XLA maps it onto the MXU ([k] x [k, tau*aDim]).
    """
    k = noises.shape[0]
    flat = noises.reshape(k, -1)
    out = jnp.einsum("k,kn->n", w, flat, preferred_element_type=flat.dtype)
    out = out.reshape(noises.shape[1:])
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def mppi_update(
    costs: jax.Array,
    noises: jax.Array,
    lam,
    normalize: bool = False,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Full update chain beta -> arg -> exp -> nabla -> weights -> wnoise.

    costs: [k], noises: [k, tau, aDim] -> weighted noise [tau, aDim].
    Composition mirrors reference controller_base.py:436-462.
    """
    b = beta(costs, axis_name)
    arg = norm_arg(costs, b, normalize=normalize, axis_name=axis_name)
    e = exp(exp_arg(arg, lam))
    n = nabla(e, axis_name)
    w = weights(e, n)
    return weighted_noise(w, noises, axis_name)


def shift(useq: jax.Array, init: jax.Array, length: int = 1) -> jax.Array:
    """Receding-horizon shift: drop the first ``length`` actions, append init.

    useq: [tau, aDim], init: [length, aDim] -> [tau, aDim].
    Reference: controller_base.py:547-552, src/controller_base.cpp:310-320.
    """
    return jnp.concatenate([useq[length:], init], axis=0)


def get_next(useq: jax.Array, length: int = 1) -> jax.Array:
    """First ``length`` actions of the sequence. [tau, aDim] -> [length, aDim].

    Reference: controller_base.py:554-556, src/controller_base.cpp:322-326.
    """
    return useq[:length]


def init_zeros(length: int, adim: int, dtype=jnp.float32) -> jax.Array:
    """Zero-filled tail for the shifted sequence. Reference: controller_base.py:558-560."""
    return jnp.zeros((length, adim), dtype=dtype)

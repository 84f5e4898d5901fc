"""Exploration-noise generation for MPPI rollouts.

The reference draws standard normals of shape [k, tau, aDim, 1] from a seeded
Philox stream and scales them by the matrix ``upsilon * sigma``
(reference: scripts/src/controllers/controller_base.py:348-369; the C++ graph
omits upsilon, src/controller_base.cpp:194-202). ``sigma`` is used as a
*scale matrix* multiplying standard normals — not a covariance square root —
and that semantic is preserved exactly.

TPU-native differences:
- explicit ``jax.random`` keys instead of global seeded streams (TF's Philox
  stream cannot and should not be replicated — parity tests inject noise as
  data instead, see SURVEY.md §7);
- flat [k, tau, aDim] layout;
- under a device mesh each shard folds its mesh axis index into the key so
  shards draw independent noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scale_noise(z: jax.Array, sigma: jax.Array, upsilon=1.0) -> jax.Array:
    """Scale standard normals by the matrix ``upsilon * sigma``.

    z: [k, tau, aDim] standard normals; sigma: [aDim, aDim].
    Returns eps with eps[k, t] = (upsilon * sigma) @ z[k, t].
    Reference: controller_base.py:368.
    """
    scale = upsilon * sigma
    return jnp.einsum(
        "ij,ktj->kti", scale, z, preferred_element_type=z.dtype
    )


def sample_noise(
    key: jax.Array,
    k: int,
    tau: int,
    adim: int,
    sigma: jax.Array,
    upsilon=1.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Draw eps = (upsilon * sigma) @ N(0, I) of shape [k, tau, aDim].

    Reference: controller_base.py:348-369.
    """
    z = jax.random.normal(key, (k, tau, adim), dtype=dtype)
    return scale_noise(z, jnp.asarray(sigma, dtype=dtype), upsilon)


def sample_noise_antithetic(
    key: jax.Array,
    k: int,
    tau: int,
    adim: int,
    sigma: jax.Array,
    upsilon=1.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Antithetic (mirrored-pair) variant of :func:`sample_noise`.

    Draws half = ceil(k/2) standard-normal sequences and mirrors them:
    eps[half + i] = -eps[i] for i < k - half. Each marginal is still exactly
    (upsilon*sigma) @ N(0, I); the pairing is a classic variance-reduction
    device for Monte-Carlo rollout estimators (and halves RNG work). Not in
    the reference (which draws k i.i.d. sequences,
    controller_base.py:348-369) — an additive option, off by default.
    """
    half = (k + 1) // 2
    z = jax.random.normal(key, (half, tau, adim), dtype=dtype)
    z = jnp.concatenate([z, -z], axis=0)[:k]
    return scale_noise(z, jnp.asarray(sigma, dtype=dtype), upsilon)

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
import numpy as np


def resolve_noise_schedule(spec, tau: int):
    """Resolve a noise-schedule spec to a ``[tau]`` float64 array (or None).

    The schedule is a per-step positive scalar ``c_t`` multiplying the noise
    scale matrix: step t draws ``eps_t = c_t * (upsilon * sigma) @ z_t`` and
    the information-theoretic action cost uses the matching per-step
    covariance ``Sigma_t = c_t * sigma`` (so the importance-sampling
    correction stays exact — the derivation is per-step independent
    Gaussians). Greenfield feature: the reference draws a single constant
    sigma over the horizon (controller_base.py:348-369); scheduling tapers
    exploration along long horizons (BASELINE.json configs[3]
    "long-horizon H=100 with noise scheduling").

    Accepted specs:
        None                                        -> None (constant sigma)
        [c_0, ..., c_{tau-1}] (list/array)          -> as given
        {"type": "constant", "value": v}            -> v everywhere
        {"type": "linear", "start": s, "end": e}    -> linspace(s, e, tau)
        {"type": "exp", "start": s, "end": e}       -> geomspace(s, e, tau)
        {"type": "cosine", "start": s, "end": e}    -> cosine anneal s -> e
    """
    if spec is None:
        return None
    if isinstance(spec, dict):
        kind = spec.get("type")
        if kind == "constant":
            out = np.full(tau, float(spec["value"]), np.float64)
        elif kind == "linear":
            out = np.linspace(float(spec["start"]), float(spec["end"]), tau)
        elif kind == "exp":
            out = np.geomspace(float(spec["start"]), float(spec["end"]), tau)
        elif kind == "cosine":
            s, e = float(spec["start"]), float(spec["end"])
            t = np.linspace(0.0, np.pi, tau)
            out = e + 0.5 * (s - e) * (1.0 + np.cos(t))
        else:
            raise ValueError(
                f"unknown noise_schedule type {kind!r}; valid: constant, "
                "linear, exp, cosine, or an explicit [tau] array")
    else:
        out = np.asarray(spec, np.float64).reshape(-1)
        if out.shape != (tau,):
            raise ValueError(
                f"explicit noise_schedule must have length tau={tau}, "
                f"got {out.shape}")
    if not np.all(out > 0.0):
        raise ValueError("noise_schedule entries must be positive "
                         "(sigma_t = c_t * sigma must stay a valid scale)")
    return out


def scale_noise(z: jax.Array, sigma: jax.Array, upsilon=1.0,
                schedule=None) -> jax.Array:
    """Scale standard normals by the matrix ``upsilon * sigma``.

    z: [k, tau, aDim] standard normals; sigma: [aDim, aDim].
    Returns eps with eps[k, t] = (upsilon * sigma) @ z[k, t], scaled by the
    per-step ``schedule`` factor c_t when one is given.
    Reference: controller_base.py:368 (constant sigma; the schedule is a
    greenfield extension, see :func:`resolve_noise_schedule`).
    """
    scale = upsilon * sigma
    eps = jnp.einsum(
        "ij,ktj->kti", scale, z, preferred_element_type=z.dtype
    )
    if schedule is not None:
        eps = eps * jnp.asarray(schedule, eps.dtype)[None, :, None]
    return eps


def sample_noise(
    key: jax.Array,
    k: int,
    tau: int,
    adim: int,
    sigma: jax.Array,
    upsilon=1.0,
    dtype=jnp.float32,
    schedule=None,
) -> jax.Array:
    """Draw eps = (upsilon * sigma) @ N(0, I) of shape [k, tau, aDim],
    optionally scaled per step by ``schedule`` (a [tau] vector c_t).

    Reference: controller_base.py:348-369.
    """
    z = jax.random.normal(key, (k, tau, adim), dtype=dtype)
    return scale_noise(z, jnp.asarray(sigma, dtype=dtype), upsilon,
                       schedule=schedule)


def sample_noise_antithetic(
    key: jax.Array,
    k: int,
    tau: int,
    adim: int,
    sigma: jax.Array,
    upsilon=1.0,
    dtype=jnp.float32,
    schedule=None,
) -> jax.Array:
    """Antithetic (mirrored-pair) variant of :func:`sample_noise`.

    Draws half = ceil(k/2) standard-normal sequences and mirrors them:
    eps[half + i] = -eps[i] for i < k - half. Each marginal is still exactly
    (upsilon*sigma) @ N(0, I); the pairing is a classic variance-reduction
    device for Monte-Carlo rollout estimators (and halves RNG work). Not in
    the reference (which draws k i.i.d. sequences,
    controller_base.py:348-369) — an additive option, off by default.
    ``schedule`` composes: both halves scale by the same c_t, so the
    mirrored pairing is preserved.
    """
    half = (k + 1) // 2
    z = jax.random.normal(key, (half, tau, adim), dtype=dtype)
    z = jnp.concatenate([z, -z], axis=0)[:k]
    return scale_noise(z, jnp.asarray(sigma, dtype=dtype), upsilon,
                       schedule=schedule)

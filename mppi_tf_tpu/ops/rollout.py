"""Batched rollout: score K noise-perturbed control sequences.

The reference unrolls a Python ``for`` loop over the horizon into the TF
graph, once per timestep (reference:
scripts/src/controllers/controller_base.py:371-434,
src/controller_base.cpp:226-273). Here the horizon is a ``lax.scan`` —
traced once, compiled once, constant-size HLO regardless of tau — carrying
the batched state [k, sDim] and accumulated cost [k].

Semantics preserved exactly from the reference loop:
- applied control at step t is ``U_t + eps_t`` (controller_base.py:404-408);
- the step cost is evaluated on the *next* state with the *unperturbed*
  action and the noise (controller_base.py:411-420);
- the terminal cost phi(x_tau) is added on top of the last step's cost, so
  the final state is scored by both q() and phi()
  (controller_base.py:427-430).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def rollout_costs(
    step_fn: Callable,
    state_cost_fn: Callable,
    action_cost_fn: Callable,
    terminal_cost_fn: Callable,
    x0: jax.Array,
    useq: jax.Array,
    noises: jax.Array,
    sched=None,
) -> jax.Array:
    """Compute per-sample rollout costs.

    Args:
        step_fn: ``(x[k, sDim], u[k, aDim]) -> x_next[k, sDim]`` — batched
            one-step dynamics (model params already bound).
        state_cost_fn: ``x[k, sDim] -> [k]`` running state cost q(x).
        action_cost_fn: ``(u[aDim], eps[k, aDim]) -> [k]`` the
            information-theoretic action cost; with ``sched`` it is called
            as ``(u, eps, c_t)`` with the step's schedule factor.
        terminal_cost_fn: ``x[k, sDim] -> [k]`` terminal cost phi(x).
        x0: [sDim] or [k, sDim] initial state (broadcast over samples,
            reference controller_base.py:393-396).
        useq: [tau, aDim] nominal action sequence.
        noises: [k, tau, aDim] noise realisations (already schedule-scaled
            when a schedule is in use — ops/noise.sample_noise(schedule=)).
        sched: optional [tau] per-step noise-schedule factors c_t
            (ops/noise.resolve_noise_schedule); threads each step's factor
            into the action cost so Sigma_t = c_t * sigma.

    Returns:
        costs: [k] total rollout cost per sample.
    """
    k = noises.shape[0]
    if x0.ndim == 1:
        x0 = jnp.broadcast_to(x0[None, :], (k, x0.shape[0]))
    # Derive the zero initial cost (and the carry's device-variance) from the
    # noise tensor: under shard_map the carry must be "varying" along the
    # mesh axis like the per-step noise is, or lax.scan rejects the carry
    # type. Adding 0 * noise is free after XLA constant folding.
    zero_k = jnp.zeros_like(noises[:, 0, 0])
    x0 = x0 + zero_k[:, None].astype(x0.dtype)
    cost0 = zero_k.astype(x0.dtype)

    # scan over time: noises transposed to [tau, k, aDim] so tau is the
    # leading (scanned) axis.
    eps_t_major = jnp.swapaxes(noises, 0, 1)

    if sched is None:
        def body(carry, inp):
            x, c = carry
            u_t, eps_t = inp
            applied = u_t[None, :] + eps_t
            x_next = step_fn(x, applied)
            c_next = c + state_cost_fn(x_next) + action_cost_fn(u_t, eps_t)
            return (x_next, c_next), None

        xs = (useq, eps_t_major)
    else:
        def body(carry, inp):
            x, c = carry
            u_t, eps_t, c_t = inp
            applied = u_t[None, :] + eps_t
            x_next = step_fn(x, applied)
            c_next = c + state_cost_fn(x_next) + action_cost_fn(
                u_t, eps_t, c_t)
            return (x_next, c_next), None

        xs = (useq, eps_t_major, jnp.asarray(sched, x0.dtype))

    (x_final, costs), _ = jax.lax.scan(body, (x0, cost0), xs)
    return costs + terminal_cost_fn(x_final)


def rollout_trajectory(
    step_fn: Callable,
    x0: jax.Array,
    useq: jax.Array,
) -> jax.Array:
    """Open-loop rollout returning the full trajectory (for validation/plots).

    x0: [k, sDim] (or [sDim]); useq: [tau, aDim] or [k, tau, aDim].
    Returns [k, tau+1, sDim] including the initial state.
    Reference: scripts/src/models/model_base.py:75-100 (``run_model``) and
    learner_base.py:249-264 (validation rollout).
    """
    squeeze = False
    if x0.ndim == 1:
        x0 = x0[None, :]
        squeeze = True
    k = x0.shape[0]
    if useq.ndim == 2:
        useq = jnp.broadcast_to(useq[None], (k,) + useq.shape)
    u_t_major = jnp.swapaxes(useq, 0, 1)  # [tau, k, aDim]

    def body(x, u_t):
        x_next = step_fn(x, u_t)
        return x_next, x_next

    _, traj = jax.lax.scan(body, x0, u_t_major)  # [tau, k, sDim]
    traj = jnp.concatenate([x0[None], traj], axis=0)
    traj = jnp.swapaxes(traj, 0, 1)  # [k, tau+1, sDim]
    return traj[0] if squeeze else traj

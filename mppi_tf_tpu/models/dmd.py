"""Dynamic Mode Decomposition (with control) dynamics model.

The reference reserves a DMD-MPPI extension point
(scripts/src/controllers/dmd_controller.py — a 4-line empty subclass named
``DMDMPPI``) but never implements the model behind it. This completes the
intent: a discrete linear model

    x_{t+1} = A x_t + B u_t

identified from observed transitions by DMD with control (DMDc; Proctor,
Brunton & Kutz, SIAM J. Appl. Dyn. Syst. 15(1), 2016): stack the snapshot
matrix Omega = [X | U] (one transition per row), take its thin SVD, and
read the operator off the pseudo-inverse,

    [A B] = Xn^T pinv(Omega)^T,  pinv via rank-r truncated SVD with
    Tikhonov-damped singular values s / (s^2 + reg).

``fit`` is a pure jnp function of the data (jit-compatible for a fixed
snapshot count), so a controller can re-identify the model online between
control steps without leaving the device. The model follows the standard
ModelBase protocol — it drops into MPPI (via controller.dmd.DMDMPPI for
online refits, single-device or mesh-sharded: ShardedDMDMPPI /
ShardedFusedDMDMPPI share the same save()-driven refit hook) and into the
Learner (whose state-MSE loss fine-tunes A and B by gradient, the
analytic-model training path). On the fused Pallas path the (A, B) ride in
SMEM (kernels/pm_mppi.FusedLTIMPPI), so refits never recompile.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import ModelBase


class DMDModel(ModelBase):
    """Discrete linear model x' = A x + B u identified by DMDc.

    ``rank``: truncate the snapshot SVD to this rank (None = full rank) —
    the standard DMD noise/conditioning control. ``reg``: Tikhonov damping
    of the singular values (guards rank-deficient snapshot sets, e.g. all
    transitions from one trajectory segment).
    """

    def __init__(self, state_dim: int, action_dim: int, dt: float = 0.1,
                 rank: Optional[int] = None, reg: float = 1e-9,
                 init_A=None, init_B=None, name: str = "dmd_model",
                 act_max=None, act_min=None, dtype=jnp.float32):
        super().__init__(state_dim, action_dim, dt=dt, name=name,
                         act_max=act_max, act_min=act_min, dtype=dtype)
        if rank is not None and not (0 < int(rank) <= state_dim + action_dim):
            raise ValueError(
                f"rank must be in [1, sDim+aDim={state_dim + action_dim}], "
                f"got {rank}")
        self._rank = None if rank is None else int(rank)
        self._reg = float(reg)
        self._init_A = (jnp.eye(state_dim, dtype=dtype) if init_A is None
                        else jnp.asarray(init_A, dtype))
        self._init_B = (jnp.zeros((state_dim, action_dim), dtype=dtype)
                        if init_B is None else jnp.asarray(init_B, dtype))
        if self._init_A.shape != (state_dim, state_dim):
            raise ValueError(f"init_A must be [{state_dim},{state_dim}], "
                             f"got {self._init_A.shape}")
        if self._init_B.shape != (state_dim, action_dim):
            raise ValueError(f"init_B must be [{state_dim},{action_dim}], "
                             f"got {self._init_B.shape}")

    def init_params(self) -> Any:
        # identity A / zero B = "hold state" prior until the first fit
        return {"A": self._init_A, "B": self._init_B}

    def step(self, params: Any, x: jax.Array, u: jax.Array) -> jax.Array:
        return x @ params["A"].T + u @ params["B"].T

    def fit(self, X, U, Xn) -> Any:
        """Identify (A, B) from transitions by truncated-SVD DMDc.

        X: [n, sDim] states, U: [n, aDim] actions, Xn: [n, sDim] successor
        states (the replay-buffer layout, learning/replay.py). Returns a
        fresh params pytree; the model instance is untouched (stateless
        protocol, models/base.py).
        """
        X = jnp.asarray(X, self._dtype)
        U = jnp.asarray(U, self._dtype)
        Xn = jnp.asarray(Xn, self._dtype)
        if X.ndim != 2 or X.shape[1] != self._state_dim:
            raise ValueError(f"X must be [n, {self._state_dim}], "
                             f"got {X.shape}")
        if U.ndim != 2 or U.shape[1] != self._action_dim:
            raise ValueError(f"U must be [n, {self._action_dim}], "
                             f"got {U.shape}")
        if Xn.shape != X.shape:
            raise ValueError(f"Xn {Xn.shape} must match X {X.shape}")
        omega = jnp.concatenate([X, U], axis=1)          # [n, s+a]
        u_svd, s, vt = jnp.linalg.svd(omega, full_matrices=False)
        if self._rank is not None:
            u_svd = u_svd[:, :self._rank]
            s = s[:self._rank]
            vt = vt[:self._rank]
        s_inv = s / (s * s + self._reg)                  # damped 1/s
        # G = [A B] (s x (s+a)):  G^T = pinv(Omega) @ Xn = V s^-1 U^T Xn
        g_t = (vt.T * s_inv) @ (u_svd.T @ Xn)
        g = g_t.T
        return {"A": g[:, :self._state_dim], "B": g[:, self._state_dim:]}

    def fit_from_buffer(self, rb) -> Any:
        """``fit`` over everything in a learning.replay.ReplayBuffer.

        The snapshot matrices are zero-padded to the buffer CAPACITY so the
        fit always runs at one static shape (one XLA executable instead of
        one per buffer fill level — an online controller refits every few
        steps while the buffer grows). Zero rows are exact no-ops for the
        least squares: they add nothing to Omega^T Omega or Omega^T Xn.
        """
        tr = rb.get_all_transitions()
        n = tr["obs"].shape[0]
        cap = rb.capacity
        if n == cap:
            return self.fit(tr["obs"], tr["act"], tr["next_obs"])
        pad = ((0, cap - n), (0, 0))
        return self.fit(np.pad(tr["obs"], pad), np.pad(tr["act"], pad),
                        np.pad(tr["next_obs"], pad))

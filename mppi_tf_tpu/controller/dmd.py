"""DMD-MPPI: MPPI over an online-identified linear (DMDc) model.

Reference: scripts/src/controllers/dmd_controller.py — a 4-line empty
subclass reserved for Dynamic Mode Decomposition MPPI. This implements the
reserved capability: the controller is a standard MPPI whose dynamics model
is a ``models.dmd.DMDModel``, re-identified from the observed transitions
as they arrive through the reference's own ``save(x, u, x_next)`` hook
(controller_base.py:147 stores applied transitions) — model-based control
that adapts to the real plant with no gradient training loop.

Flow per control step (the reference main.py loop, envs/runner.py here):

    u = ctrl.next(x)        # MPPI solve under the current (A, B)
    x' = plant.step(u)
    ctrl.save(x, u, x')     # buffer the transition; every ``refit_every``
                            # saves, refit (A, B) by truncated-SVD DMDc

The refit is a pure jnp least-squares over the replay window — no retrace:
only the ``model_params`` pytree changes, shapes stay static. On the fused
(Pallas) path the (A, B) matrices ride in the kernel's SMEM dynamic array
(kernels/pm_mppi.FusedLTIMPPI), so refits reuse ONE compiled executable.

Three concrete controllers share the refit machinery
(:class:`DMDAdaptiveMixin`):

- :class:`DMDMPPI` — single-device (XLA scan or fused Pallas kernel);
- :class:`ShardedDMDMPPI` — K sharded over a ``jax.sharding.Mesh`` (XLA);
- :class:`ShardedFusedDMDMPPI` — mesh-sharded fused kernel per shard.
"""

from __future__ import annotations

import numpy as np

from ..learning.replay import ReplayBuffer
from ..models.dmd import DMDModel
from ..parallel.fused import ShardedFusedMPPI
from ..parallel.sharded import ShardedMPPI
from .mppi import MPPI


class DMDAdaptiveMixin:
    """Online DMDc identification riding the ``save()`` hook.

    Composes over any controller exposing the shared surface
    (``save``/``save_state``/``load_state``/``model_params``):

    ``refit_every``: re-identify (A, B) every N saved transitions.
    ``min_samples``: do not fit before this many transitions are buffered
    (default 2*(sDim+aDim) — the snapshot matrix needs at least sDim+aDim
    independent rows for a unique operator).
    ``buffer_capacity``: replay window; old transitions roll off, so the
    model tracks a (slowly) time-varying plant.
    """

    def __init__(self, model: DMDModel, cost, *args, refit_every: int = 10,
                 min_samples: int | None = None,
                 buffer_capacity: int = 4096, **kwargs):
        if not isinstance(model, DMDModel):
            raise TypeError(
                f"{type(self).__name__} needs a models.dmd.DMDModel (got "
                f"{type(model).__name__})")
        super().__init__(model, cost, *args, **kwargs)
        if refit_every < 1:
            raise ValueError(f"refit_every must be >= 1, got {refit_every}")
        sdim, adim = model.get_state_dim(), model.get_action_dim()
        self._rb = ReplayBuffer(buffer_capacity, sdim, adim)
        self._refit_every = int(refit_every)
        self._min_samples = (2 * (sdim + adim) if min_samples is None
                             else int(min_samples))
        self._saves = 0
        self._fits = 0

    def save(self, x, u, x_next):
        """Buffer the applied transition and periodically refit the model
        (then fall through to the standard prediction-error logging)."""
        self._rb.add(x, u, x_next)
        self._saves += 1
        if (self._saves % self._refit_every == 0
                and len(self._rb) >= self._min_samples):
            self.model_params = self._model.fit_from_buffer(self._rb)
            self._fits += 1
        super().save(x, u, x_next)

    def fit_now(self):
        """Force an immediate refit (e.g. after pre-seeding the buffer with
        collected exploration transitions, collect.py)."""
        if len(self._rb) < self._min_samples:
            raise ValueError(
                f"{len(self._rb)} transitions buffered; need at least "
                f"min_samples={self._min_samples} to identify the model")
        self.model_params = self._model.fit_from_buffer(self._rb)
        self._fits += 1

    def save_state(self, path: str):
        """Checkpoint the controller state PLUS the identification state:
        the identified (A, B), the replay window, and the save/fit counters
        (a resumed controller must keep refitting from where it left off).
        Writes ``path`` (base controller state, .npz) and
        ``path + '.dmd.npz'``.
        """
        super().save_state(path)
        tr = self._rb.get_all_transitions()
        np.savez(path + ".dmd.npz",
                 A=np.asarray(self.model_params["A"]),
                 B=np.asarray(self.model_params["B"]),
                 obs=tr["obs"], act=tr["act"], next_obs=tr["next_obs"],
                 saves=self._saves, fits=self._fits)

    def load_state(self, path: str):
        super().load_state(path)
        d = np.load(path + ".dmd.npz")
        import jax.numpy as jnp

        self.model_params = {
            "A": jnp.asarray(d["A"], self._dtype),
            "B": jnp.asarray(d["B"], self._dtype)}
        self._rb = ReplayBuffer(self._rb.capacity, self._rb.s_dim,
                                self._rb.a_dim)
        for o, a, n in zip(d["obs"], d["act"], d["next_obs"]):
            self._rb.add(o, a, n)
        self._saves = int(d["saves"])
        self._fits = int(d["fits"])

    @property
    def replay(self) -> ReplayBuffer:
        return self._rb

    @property
    def n_fits(self) -> int:
        return self._fits


class DMDMPPI(DMDAdaptiveMixin, MPPI):
    """Single-device MPPI with online DMDc model identification.

    ``kernel='pallas'`` (or ``'auto'`` on TPU) runs the fused
    :class:`~..kernels.pm_mppi.FusedLTIMPPI` kernel — refits change only
    SMEM data, never the executable.
    """


class ShardedDMDMPPI(DMDAdaptiveMixin, ShardedMPPI):
    """Mesh-sharded (XLA) MPPI with online DMDc identification — the
    adaptive controller at pod scale; refits replicate the new (A, B)
    pytree, the sharded solve never retraces."""


class ShardedFusedDMDMPPI(DMDAdaptiveMixin, ShardedFusedMPPI):
    """Mesh-sharded fused-kernel MPPI with online DMDc identification:
    every shard runs the dynamic-(A, B) Pallas kernel
    (kernels/pm_mppi.FusedLTIMPPI) on its K/n samples."""

"""Fused Pallas MPPI solve kernels (the TPU hot path).

Coverage and the design decision per model family (SURVEY.md §7):

- PointMassModel x {StaticCost, ElipseCost}: ``pm_mppi.FusedPointMassMPPI``.
- AUVModel x {StaticQuatCost, ElipseCost3D}: ``auv_mppi.FusedAUVMPPI``.
- NN dynamics (NNModel/NNAUVModel/NNAUVModelSpeed): deliberately stay on the
  XLA ``lax.scan`` path. The MLP's per-step matmuls are K-batched onto the
  MXU by XLA directly ([K, features] @ [features, hidden]); measured
  0.26 ms/solve at K=8192, H=25 on one v5e chip — the folded (8, L)
  component-major VMEM layout the hand kernels use is lane-major per sample
  and would have to relayout for every MXU matmul, forfeiting its advantage.
  The hand kernels win where the dynamics are scalar-coefficient FMA chains
  (analytic models); XLA wins where the dynamics are matmuls.

Both kernels are measured at/near the VPU issue-rate bound for their op
sequence (see kernels/pm_mppi.py header and the perf notes in README.md).
"""

from .auv_mppi import FusedAUVMPPI
from .pm_mppi import FusedPointMassMPPI, fused_pm_solve

__all__ = ["FusedAUVMPPI", "FusedPointMassMPPI", "fused_pm_solve"]

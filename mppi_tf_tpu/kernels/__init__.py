"""Fused Pallas MPPI solve kernels (the TPU hot path).

Coverage and the design decision per model family (SURVEY.md §7):

- PointMassModel x {StaticCost, ElipseCost}: ``pm_mppi.FusedPointMassMPPI``.
- AUVModel x {StaticQuatCost, ElipseCost3D}: ``auv_mppi.FusedAUVMPPI``.
- NN dynamics (NNModel/NNAUVModel/NNAUVModelSpeed): deliberately stay on the
  XLA ``lax.scan`` path. The MLP's per-step matmuls are K-batched onto the
  MXU by XLA directly ([K, features] @ [features, hidden], bf16 inputs with
  f32 accumulation); measured 0.36 ms/solve at K=16384 and 1.26 ms at
  K=65536 (H=25, one v5e chip). A fused VMEM-resident kernel was sized and
  rejected: with 16/32-wide feature dims every MXU pass pads the contraction
  and output dims to 128, capping the ideal fused solve at ~0.55 ms (bf16)
  to ~1.1 ms (f32) at K=65536 before noise-gen/cost VPU work — at best
  ~1.5x over XLA, versus the 6-10x the analytic kernels gain from their
  scalar-coefficient FMA folding (which needs compile-time-constant
  dynamics and therefore cannot apply to learned weights). A pure-VPU
  formulation is strictly worse (~3.5 ms: 9.7 GFLOP of useful work against
  a ~1.9 TFLOP/s VPU). The hand kernels win where the dynamics are
  scalar-coefficient FMA chains (analytic models); XLA wins where the
  dynamics are matmuls.

Both kernels are measured at/near the VPU issue-rate bound for their op
sequence (see kernels/pm_mppi.py header and the perf notes in README.md).
"""

from .auv_mppi import FusedAUVMPPI
from .errors import KernelUnsupportedError
from .pm_mppi import FusedPointMassMPPI, fused_pm_solve

__all__ = ["FusedAUVMPPI", "FusedPointMassMPPI", "KernelUnsupportedError",
           "fused_pm_solve"]

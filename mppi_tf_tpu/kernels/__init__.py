from .pm_mppi import FusedPointMassMPPI, fused_pm_solve

__all__ = ["FusedPointMassMPPI", "fused_pm_solve"]

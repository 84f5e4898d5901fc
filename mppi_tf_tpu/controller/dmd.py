"""DMD-MPPI controller placeholder.

Reference: scripts/src/controllers/dmd_controller.py (a 4-line empty
subclass reserved for Dynamic Mode Decomposition MPPI). Kept as an explicit
extension point with the same name so reference users find it.
"""

from .mppi import MPPI


class DMDMPPI(MPPI):
    """Reserved: MPPI over a DMD-identified linear latent model."""

"""Phase solidification (multi-phase Allen-Cahn variant).

Reference: src/physics/phasesolidification.hpp (header-only, 713 LoC) —
same interaction structure as msphasefield:
  (phi_j_t, v) + L (16 A phi_j (-phi_j + sum_i phi_i^2), v)
              + L diff^2 (grad phi_j, grad v)
with solidification-specific L/A/diff parameter conventions.
"""

from __future__ import annotations

from mrhyde_tpu.physics.msphasefield import MSPhasefield
from mrhyde_tpu.physics.registry import register

__all__ = ["PhaseSolidification"]


@register("phasesolidification")
class PhaseSolidification(MSPhasefield):
    name = "phasesolidification"

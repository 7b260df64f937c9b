"""Phase solidification (multi-phase Allen-Cahn variant).

Reference: src/physics/phasesolidification.hpp:166-230 (header-only,
713 LoC). Weak form per phase j:

  (phi_j_t, v) + L (16 A phi_j (-phi_j + sum_i phi_i^2), v)
               + L diff^2 (grad phi_j, grad v)

Differences from msphasefield reproduced deliberately:
- the well coefficient is 16 A in EVERY dimension
  (phasesolidification.hpp:220; msphasefield uses 4 A in 3D),
- the 3D gradient term double-counts the z-contribution
  (phasesolidification.hpp:224-225: `dphidz*dvdz + dphidz*dvdz`),
- the per-qp solution vectors are declared INSIDE the quadrature loop
  (phasesolidification.hpp:186-192), so msphasefield's frozen
  first-qp sampling quirk does NOT apply here.

Scalar parameters L / A / thermal_diff arrive through the parameter
vector (reference updateParameters, phasesolidification.hpp:665-679)
with Function-sublist fallbacks.
"""

from __future__ import annotations

import jax.numpy as jnp

from mrhyde_tpu.physics.msphasefield import MSPhasefield
from mrhyde_tpu.physics.registry import register

__all__ = ["PhaseSolidification"]


@register("phasesolidification")
class PhaseSolidification(MSPhasefield):
    name = "phasesolidification"

    def volume_residual(self, wk):
        L = self._coef(wk, "L", "L")
        A = self._coef(wk, "A", "A")
        diff = self._coef(wk, "thermal_diff", "diff")
        phis = [wk.sol(p) for p in self.phases]
        sumphi = sum(p * p for p in phis)
        for j, name in enumerate(self.phases):
            g = wk.grad(name)
            wk.add_source(name, wk.sol_dot(name)
                          + L * 16.0 * A * phis[j]
                          * (-phis[j] + sumphi))
            coef = jnp.broadcast_to(
                jnp.asarray(L * diff * diff)[..., None], g.shape)
            if self.dim > 2:
                # reference doubles the z-term
                # (phasesolidification.hpp:224-225)
                coef = coef * jnp.array([1.0] * 2 + [2.0])
            wk.add_flux(name, coef * g)

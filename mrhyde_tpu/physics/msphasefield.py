"""Multi-species phase field (reference: src/physics/msphasefield.cpp):
per species j (Allen-Cahn with cross-species interaction):
  (phi_j_t, v) + L*(16 A phi_j (-phi_j + sum_i phi_i^2), v)
              + L*diff^2 (grad phi_j, grad v)
Species named phi1..phiN (number_phases setting).
"""

from __future__ import annotations

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["MSPhasefield"]


@register("msphasefield")
class MSPhasefield(PhysicsModule):
    name = "msphasefield"

    def __init__(self, settings=None, dim: int = 2):
        super().__init__(settings, dim)
        self.numphases = int(self.settings.get("number_phases", 1))
        self.phases = [f"phi{i + 1}" for i in range(self.numphases)]

    def variables(self):
        return [(p, "HGRAD", 1) for p in self.phases]

    def define_functions(self, fm, fs):
        fm.add_function("L", self._f(fs, "L", 1.0), "ip")
        fm.add_function("A", self._f(fs, "A", 1.0), "ip")
        fm.add_function("diff", self._f(fs, "diff", 1.0), "ip")

    def volume_residual(self, wk):
        L = wk.qp(wk.f("L"))
        A = wk.qp(wk.f("A"))
        diff = wk.qp(wk.f("diff"))
        phis = [wk.sol(p) for p in self.phases]
        sumphi = sum(p * p for p in phis)
        for j, name in enumerate(self.phases):
            wk.add_source(name, wk.sol_dot(name)
                          + L * 16.0 * A * phis[j] * (-phis[j] + sumphi))
            wk.add_flux(name, (L * diff * diff)[:, None] * wk.grad(name))

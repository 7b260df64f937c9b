"""Mixed-form porous (Darcy) flow: HDIV velocity + HVOL pressure.

Weak form (reference: src/physics/porousMixed.cpp volumeResidual /
boundaryResidual):
  u-eq: (Kinv u, v) - (p, div v) + <p_D, v.n>_GammaD
  p-eq: (div u - source, q)
Dirichlet pressure data enters naturally through the boundary integral.
"""

from __future__ import annotations

import jax.numpy as jnp

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["PorousMixed"]


@register("porous mixed")
class PorousMixed(PhysicsModule):
    name = "porousMixed"

    def __init__(self, settings=None, dim: int = 2):
        super().__init__(settings, dim)
        from mrhyde_tpu.physics.wells import Wells
        self.wells = Wells(self.settings)

    def variables(self):
        return [("p", "HVOL", 0), ("u", "HDIV", 1)]

    def define_functions(self, fm, fs):
        fm.add_function("source", self._f(fs, "source", 0.0), "ip")
        for k in ("Kinv_xx", "Kinv_yy", "Kinv_zz"):
            fm.add_function(k, self._f(fs, k, 1.0), "ip")
        fm.add_function("total_mobility",
                        self._f(fs, "total_mobility", 1.0), "ip")

    def volume_residual(self, wk):
        dim = self.dim
        Kinv = [wk.qp(wk.f("Kinv_xx"))]
        if dim > 1:
            Kinv.append(wk.qp(wk.f("Kinv_yy")))
        if dim > 2:
            Kinv.append(wk.qp(wk.f("Kinv_zz")))
        u = wk.sol("u")                      # (Q, dim)
        p = wk.sol("p")
        Kiu = jnp.stack([Kinv[d] * u[:, d] for d in range(dim)], axis=1)
        wk.add_vec_source("u", Kiu)
        wk.add_div_source("u", -p)
        src = wk.qp(wk.f("source"))
        if self.wells:
            src = self.wells.add_sources(src, wk)
        wk.add_source("p", wk.div("u") - src)

    def boundary_residual(self, wk):
        if wk.bcs.get("p") == "Dirichlet":
            pD = wk.qp(wk.f(f"Dirichlet p {wk.side_name}", "side ip"))
            wk.add_vec_source("u", pD[:, None] * wk.normals)

"""Two-phase incompressible saturation transport (reference:
src/physics/incompressibleSaturation.cpp):
  (phi S_t, v) - (f_w u_vec, grad v) - (source_S, v)
with constant porosity phi and velocity functions ux/uy/uz.
"""

from __future__ import annotations

import jax.numpy as jnp

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["IncompressibleSaturation"]


@register("inc sat")
class IncompressibleSaturation(PhysicsModule):
    name = "incompressibleSaturation"

    def __init__(self, settings=None, dim: int = 2):
        super().__init__(settings, dim)
        self.phi = float(self.settings.get("porosity", 0.5))
        # Peaceman well sources (reference:
        # incompressibleSaturation.cpp:40-41,88-92 'use well source'
        # -> wells<EvalT>::addWellSources; same helper as porousMixed)
        self.wells = None
        if bool(self.settings.get("use well source", False)):
            from mrhyde_tpu.physics.wells import Wells
            self.wells = Wells(self.settings)

    def variables(self):
        return [("S", "HGRAD", 1)]

    def define_functions(self, fm, fs):
        fm.add_function("source_S", self._f(fs, "source_S", 0.0), "ip")
        fm.add_function("f_w", self._f(fs, "f_w", 1.0), "ip")
        fm.add_function("ux", self._f(fs, "ux", 0.0), "ip")
        if self.dim > 1:
            fm.add_function("uy", self._f(fs, "uy", 0.0), "ip")
        if self.dim > 2:
            fm.add_function("uz", self._f(fs, "uz", 0.0), "ip")

    def volume_residual(self, wk):
        fw = wk.qp(wk.f("f_w"))
        vel = [wk.qp(wk.f("ux"))]
        if self.dim > 1:
            vel.append(wk.qp(wk.f("uy")))
        if self.dim > 2:
            vel.append(wk.qp(wk.f("uz")))
        src = wk.qp(wk.f("source_S"))
        if self.wells is not None:
            src = self.wells.add_sources(src, wk)
        wk.add_source("S", self.phi * wk.sol_dot("S") - src)
        wk.add_flux("S", -fw[:, None] * jnp.stack(vel, axis=1))

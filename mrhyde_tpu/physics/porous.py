"""Single-phase porous media (slightly compressible Darcy flow), HGRAD.

Weak form (reference: src/physics/porous.cpp volumeResidual):
  (phi rho_ref c p_t - source, w) + (K/mu rho_ref (1 + c (p - p_ref))
   grad p, grad w)
"""

from __future__ import annotations

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["Porous"]


@register("porous")
class Porous(PhysicsModule):
    name = "porous"

    def variables(self):
        return [("p", "HGRAD", 1)]

    def define_functions(self, fm, fs):
        fm.add_function("source", self._f(fs, "porous source", 0.0), "ip")
        fm.add_function("permeability",
                        self._f(fs, "permeability", 1.0), "ip")
        fm.add_function("porosity", self._f(fs, "porosity", 1.0), "ip")
        fm.add_function("viscosity", self._f(fs, "viscosity", 1.0), "ip")
        fm.add_function("reference density",
                        self._f(fs, "reference density", 1.0), "ip")
        fm.add_function("reference pressure",
                        self._f(fs, "reference pressure", 1.0), "ip")
        fm.add_function("compressibility",
                        self._f(fs, "compressibility", 0.0), "ip")
        fm.add_function("gravity", self._f(fs, "gravity", 1.0), "ip")
        for n in ("source", "permeability", "viscosity"):
            key = "porous source" if n == "source" else n
            fm.add_function(n, self._f(fs, key,
                                       0.0 if n == "source" else 1.0),
                            "side ip")

    def volume_residual(self, wk):
        perm = wk.qp(wk.f("permeability"))
        poro = wk.qp(wk.f("porosity"))
        visc = wk.qp(wk.f("viscosity"))
        densref = wk.qp(wk.f("reference density"))
        pref = wk.qp(wk.f("reference pressure"))
        comp = wk.qp(wk.f("compressibility"))
        source = wk.qp(wk.f("source"))
        p = wk.sol("p")
        pdot = wk.sol_dot("p")
        gradp = wk.grad("p")
        Kdens = perm / visc * densref * (1.0 + comp * (p - pref))
        wk.add_source("p", poro * densref * comp * pdot - source)
        wk.add_flux("p", Kdens[:, None] * gradp)

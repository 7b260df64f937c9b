"""Low-Mach variable-density Navier-Stokes (VDNS).

Reference: src/physics/variableDensityNS.cpp — variables ux[,uy,uz],
pr, T with ideal-gas density rho = p0/(R T):
  momentum d: (mu (2 du_d/dx_d - 2/3 div u) - pr, dv/dx_d)
              + (mu (du_d/dx_j + du_j/dx_d), dv/dx_j) for j != d
              + (rho (u_d_t + u . grad u_d) - source_d, v)
  continuity: (div u - (1/T)(T_t + u . grad T), q)
              [low-Mach thermal-divergence constraint; constant p0]
  energy:     (rho (T_t + u . grad T) - source_T, v)
              + (lambda/cp grad T, grad v)
Optional SUPG/GRADDIV stabilizations of the reference are not yet
ported (useSUPG/useGRADDIV default to off there as well).
"""

from __future__ import annotations

import jax.numpy as jnp

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["VDNS"]

_VELS = ["ux", "uy", "uz"]


@register("VDNS")
class VDNS(PhysicsModule):
    name = "VDNS"

    def variables(self):
        out = [("ux", "HGRAD", 1), ("pr", "HGRAD", 1), ("T", "HGRAD", 1)]
        if self.dim > 1:
            out.insert(1, ("uy", "HGRAD", 1))
        if self.dim > 2:
            out.insert(2, ("uz", "HGRAD", 1))
        return out

    def define_functions(self, fm, fs):
        for v in ("ux", "pr", "uy", "uz", "T"):
            fm.add_function(f"source {v}",
                            self._f(fs, f"source {v}", 0.0), "ip")
        fm.add_function("mu", self._f(fs, "mu", 0.01178), "ip")
        fm.add_function("cp", self._f(fs, "cp", 1004.5), "ip")
        fm.add_function("gamma", self._f(fs, "gamma", 1.4), "ip")
        fm.add_function("RGas", self._f(fs, "RGas", 287.0), "ip")
        fm.add_function("p0", self._f(fs, "p0", 100000.0), "ip")
        fm.add_function("PrNum", self._f(fs, "PrNum", 0.7), "ip")
        fm.add_function("rho", self._f(fs, "rho", "p0/(RGas*T)"), "ip")
        fm.add_function("lambda", self._f(fs, "lambda", "cp*mu/PrNum"),
                        "ip")

    def volume_residual(self, wk):
        dim = self.dim
        vels = _VELS[:dim]
        mu = wk.qp(wk.f("mu"))
        rho = wk.qp(wk.f("rho"))
        cp = wk.qp(wk.f("cp"))
        lam = wk.qp(wk.f("lambda"))
        pr = wk.sol("pr")
        T = wk.sol("T")
        T_t = wk.sol_dot("T")
        gradT = wk.grad("T")
        uvals = {v: wk.sol(v) for v in vels}
        udots = {v: wk.sol_dot(v) for v in vels}
        grads = {v: wk.grad(v) for v in vels}
        divu = sum(grads[v][:, d] for d, v in enumerate(vels))
        conv = {v: sum(uvals[w] * grads[v][:, j]
                       for j, w in enumerate(vels)) for v in vels}
        convT = sum(uvals[w] * gradT[:, j] for j, w in enumerate(vels))

        for d, v in enumerate(vels):
            flux = jnp.stack(
                [mu * (grads[v][:, j] + grads[vels[j]][:, d])
                 if j != d else
                 mu * (2.0 * grads[v][:, d] - 2.0 / 3.0 * divu) - pr
                 for j in range(dim)], axis=1)
            wk.add_flux(v, flux)
            wk.add_source(v, rho * (udots[v] + conv[v])
                          - wk.qp(wk.f(f"source {v}")))

        wk.add_source("pr", divu - (T_t + convT) / T)

        wk.add_source("T", rho * (T_t + convT) - wk.qp(wk.f("source T")))
        wk.add_flux("T", (lam / cp)[:, None] * gradT)

"""Maxwell's equations: HCURL electric field E + HDIV magnetic field B.

Weak form (reference: src/physics/maxwell.cpp volumeResidual):
  B-eq (HDIV, 3D / HVOL, 2D):  (B_t + curl E, w)
  E-eq (HCURL): (n^2 E_t + (sigma E + J)/eps, v) - (B/(mu eps), curl v)
(the reference folds 1/eps into the E equation in 3D; 2D keeps eps on
the time term). Leap-frog staging supported via the 'leap-frog' tableau.
"""

from __future__ import annotations

import jax.numpy as jnp

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["Maxwell"]


@register("maxwell")
@register("maxwell control")
class Maxwell(PhysicsModule):
    """Also registered as 'maxwell control' (reference:
    maxwell_control.cpp): identical E-B weak form with the current
    source J parametrized for optimal control -- here the generic
    parameter machinery differentiates through J, so one module
    serves both deck names."""
    name = "maxwell"

    def variables(self):
        if self.dim == 2:
            return [("E", "HCURL", 1), ("B", "HVOL", 0)]
        return [("E", "HCURL", 1), ("B", "HDIV", 1)]

    def define_functions(self, fm, fs):
        fm.add_function("current x", self._f(fs, "current x", 0.0), "ip")
        fm.add_function("current y", self._f(fs, "current y", 0.0), "ip")
        fm.add_function("current z", self._f(fs, "current z", 0.0), "ip")
        fm.add_function("mu", self._f(fs, "permeability", 1.0), "ip")
        fm.add_function("epsilon", self._f(fs, "permittivity", 1.0), "ip")
        fm.add_function("refractive index",
                        self._f(fs, "refractive index", 1.0), "ip")
        fm.add_function("sigma", self._f(fs, "conductivity", 0.0), "ip")

    def volume_residual(self, wk):
        mu = wk.qp(wk.f("mu"))
        eps = wk.qp(wk.f("epsilon"))
        n = wk.qp(wk.f("refractive index"))
        sig = wk.qp(wk.f("sigma"))
        E = wk.sol("E")                  # (Q, dim)
        E_t = wk.sol_dot("E")
        curlE = wk.curl("E")             # (Q,) 2D / (Q,3) 3D

        if self.dim == 2:
            B = wk.sol("B")              # scalar (Q,)
            B_t = wk.sol_dot("B")
            wk.add_source("B", B_t + curlE)
            J = jnp.stack([wk.qp(wk.f("current x")),
                           wk.qp(wk.f("current y"))], axis=1)
            f = ((eps * n * n)[:, None] * E_t + sig[:, None] * E + J)
            wk.add_vec_source("E", f)
            wk.add_curl_source("E", -B / mu)
        else:
            B = wk.sol("B")              # (Q, 3)
            B_t = wk.sol_dot("B")
            wk.add_vec_source("B", B_t + curlE)
            J = jnp.stack([wk.qp(wk.f("current x")),
                           wk.qp(wk.f("current y")),
                           wk.qp(wk.f("current z"))], axis=1)
            f = ((n * n)[:, None] * E_t + (sig[:, None] * E + J)
                 / eps[:, None])
            wk.add_vec_source("E", f)
            wk.add_curl_source("E", -B / (mu * eps)[:, None])

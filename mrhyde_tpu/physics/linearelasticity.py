"""Linear elasticity physics module.

Weak form (reference: src/physics/linearelasticity.cpp:90-235 +
computeStress): stress sigma = lambda tr(eps) I + 2 mu eps with
eps = sym(grad d); residual_d = (sigma_d., grad v) - (source_d, v).
Thermoelastic coupling (sigma -= alpha_T (3 lambda + 2 mu) dT I) when a
temperature variable 'e' is present and 'thermoelastic' is enabled.
"""

from __future__ import annotations

import jax.numpy as jnp

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["LinearElasticity"]

_DISP = ["dx", "dy", "dz"]


@register("linearelasticity")
class LinearElasticity(PhysicsModule):
    name = "linearelasticity"

    def __init__(self, settings=None, dim: int = 2):
        super().__init__(settings, dim)
        # thermoelastic coupling auto-activates when a temperature
        # variable 'e' shares the set (reference: linearelasticity.cpp
        # e_num >= 0 adds -alpha_T (T - T_ambient)(3 lambda + 2 mu) I)
        self.thermoelastic = bool(self.settings.get(
            "thermoelastic", self.settings.get("use thermoelastic", False)))
        self.t_ambient = float(self.settings.get("T_ambient", 0.0))
        self.alpha_T = float(self.settings.get("alpha_T", 1.0e-6))

    def variables(self):
        return [(d, "HGRAD", 1) for d in _DISP[:self.dim]]

    def define_functions(self, fm, fs):
        fm.add_function("lambda", self._f(fs, "lambda", 1.0), "ip")
        fm.add_function("mu", self._f(fs, "mu", 0.5), "ip")
        fm.add_function("lambda", self._f(fs, "lambda", 1.0), "side ip")
        fm.add_function("mu", self._f(fs, "mu", 0.5), "side ip")
        for d in _DISP:
            fm.add_function(f"source {d}",
                            self._f(fs, f"source {d}", 0.0), "ip")
        fm.add_function("alpha_T", self._f(fs, "alpha_T", self.alpha_T),
                        "ip")

    def _stress(self, wk):
        dim = self.dim
        lam = wk.qp(wk.f("lambda"))
        mu = wk.qp(wk.f("mu"))
        grads = [wk.grad(d)[:, :dim] for d in _DISP[:dim]]  # list of (Q,dim)
        G = jnp.stack(grads, axis=1)            # (Q, dim, dim): G[q,i,j]=d_i,j
        eps = 0.5 * (G + jnp.swapaxes(G, 1, 2))
        tr = jnp.trace(eps, axis1=1, axis2=2)
        I = jnp.eye(dim)
        sigma = (lam * tr)[:, None, None] * I + 2.0 * mu[:, None, None] * eps
        if "e" in wk.offsets:
            aT = wk.qp(wk.f("alpha_T"))
            T = wk.sol("e")
            sigma = sigma - (aT * (3 * lam + 2 * mu)
                             * (T - self.t_ambient))[:, None, None] * I
        return sigma

    def volume_residual(self, wk):
        dim = self.dim
        sigma = self._stress(wk)
        for d, name in enumerate(_DISP[:dim]):
            wk.add_flux(name, sigma[:, d, :])
            wk.add_source(name, -wk.qp(wk.f(f"source {name}")))

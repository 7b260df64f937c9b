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

    def _stress(self, wk, loc="ip"):
        dim = self.dim
        mu = wk.qp(wk.f("mu", loc))
        if bool(self.settings.get("incplanestress", False)):
            # incompressible plane stress: lambda = 2 mu
            # (linearelasticity.cpp:935,990,1104)
            lam = 2.0 * mu
        else:
            lam = wk.qp(wk.f("lambda", loc))
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

    def boundary_residual(self, wk):
        dim = self.dim
        names = _DISP[:dim]
        if any(wk.bcs.get(n) == "interface" for n in names):
            # multiscale Nitsche coupling vs the macro displacement
            # trace (reference: linearelasticity.cpp:333-470):
            # res_i += [-(sigma n)_i + pen (u-lam)_i] v
            #          - form_param * tau(u-lam, n)_i . grad v
            # with tau(D,n) = lambda (D.n) I + mu (D x n + n x D)
            lam = wk.qp(wk.f("lambda", "side ip"))
            mu = wk.qp(wk.f("mu", "side ip"))
            n = wk.normals
            sigma = self._stress(wk, "side ip")
            pen = (float(self.settings.get("penalty", 10.0))
                   * (lam + 2.0 * mu) / wk.side_h)
            sf = float(self.settings.get("form_param", 1.0))
            delta = jnp.stack(
                [wk.sol(v) - wk.qp(wk.resolve(f"aux {v}"))
                 for v in names], axis=1)                  # (Q, dim)
            dn = (delta * n).sum(axis=1)
            I = jnp.eye(dim)
            tau = (lam * dn)[:, None, None] * I + mu[:, None, None] * (
                delta[:, :, None] * n[:, None, :]
                + n[:, :, None] * delta[:, None, :])       # (Q, dim, dim)
            for i, v in enumerate(names):
                fluxn = (sigma[:, i, :] * n).sum(axis=1)
                wk.add_source(v, pen * delta[:, i] - fluxn)
                if sf != 0.0:
                    st, nd = wk.offsets[v]
                    dg = wk.basis_grad(v)                  # (ndof, Q, dim)
                    contrib = -sf * jnp.einsum(
                        "iqd,qd,q->i", dg, tau[:, i, :], wk.wts)
                    wk._res = wk._res.at[st:st + nd].add(contrib)
            return
        # Neumann tractions per displacement component (reference:
        # linearelasticity.cpp:267-315, res += -g v wts)
        for name in names:
            if wk.bcs.get(name) == "Neumann":
                g = wk.f(f"Neumann {name} {wk.side_name}", "side ip")
                wk.add_source(name, -wk.qp(g))

    def compute_flux(self, wk):
        """Upscaled traction for multiscale coupling (reference:
        linearelasticity.cpp:677-800 computeFlux):
        flux_i = (sigma n)_i + pen (lam - u)_i."""
        dim = self.dim
        lam = wk.qp(wk.f("lambda", "side ip"))
        mu = wk.qp(wk.f("mu", "side ip"))
        n = wk.normals
        sigma = self._stress(wk, "side ip")
        pen = (float(self.settings.get("penalty", 10.0))
               * (lam + 2.0 * mu) / wk.side_h)
        out = {}
        for i, v in enumerate(_DISP[:dim]):
            delta = wk.qp(wk.resolve(f"aux {v}")) - wk.sol(v)
            out[v] = (sigma[:, i, :] * n).sum(axis=1) + pen * delta
        return out

"""Hybridized/stabilized shallow water equations.

Reference: src/physics/shallowwaterHybridized.cpp — HGRAD variables
(H, Hux[, Huy]) in conservation form with boundary flux
stabilization built from the flux-Jacobian eigendecomposition (the
module's eigendecomposition is unit-tested in the reference,
unit_tests/physics/shallowwaterHybridized.cpp; SWE_unittest.ipynb).
The interior weak form matches the conservative SWE:
  (H_t, w) - (Hu, grad w)
  (Hu_t, w) - (Hu x Hu / H + g H^2 / 2 I, grad w)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["ShallowWaterHybridized", "swe_flux_jacobian_eig"]


def swe_flux_jacobian_eig(H, hu, n, gravity=9.8):
    """Eigen-structure of the SWE normal flux Jacobian (reference:
    shallowwaterHybridized eigendecompFluxJacobian; verified against
    jacfwd of the flux). hu: (dim,) momentum; n: unit normal."""
    import jax
    dim = np.asarray(n).shape[0]
    state = jnp.concatenate([jnp.atleast_1d(jnp.asarray(H, float)),
                             jnp.asarray(hu, float)])
    n = jnp.asarray(n, dtype=float)

    def flux_n(s):
        h = s[0]
        mom = s[1:]
        vel = mom / h
        un = jnp.dot(vel, n)
        F_h = jnp.dot(mom, n)
        F_m = mom * un + 0.5 * gravity * h * h * n
        return jnp.concatenate([jnp.array([F_h]), F_m])

    A = jax.jacfwd(flux_n)(state)
    vel = state[1:] / state[0]
    un = jnp.dot(vel, n)
    a = jnp.sqrt(gravity * state[0])
    lam = jnp.concatenate([jnp.array([un - a]),
                           jnp.full((dim - 1,), un),
                           jnp.array([un + a])])
    return np.asarray(A), np.asarray(lam)


@register("shallow water hybridized")
class ShallowWaterHybridized(PhysicsModule):
    name = "shallowwaterHybridized"

    def __init__(self, settings=None, dim: int = 2):
        super().__init__(settings, dim)
        self.gravity = float(self.settings.get("gravity", 9.8))

    def variables(self):
        out = [("H", "HGRAD", 1), ("Hux", "HGRAD", 1)]
        if self.dim > 1:
            out.append(("Huy", "HGRAD", 1))
        return out

    def define_functions(self, fm, fs):
        for v in ("H", "Hux", "Huy"):
            fm.add_function(f"source {v}",
                            self._f(fs, f"source {v}", 0.0), "ip")

    def volume_residual(self, wk):
        g = self.gravity
        dim = self.dim
        H = wk.sol("H")
        mom = [wk.sol("Hux")]
        if dim > 1:
            mom.append(wk.sol("Huy"))
        wk.add_source("H", wk.sol_dot("H") - wk.qp(wk.f("source H")))
        wk.add_flux("H", -jnp.stack(mom, axis=1))
        pres = 0.5 * g * H * H
        names = ["Hux", "Huy"][:dim]
        for d, name in enumerate(names):
            F = jnp.stack([mom[d] * mom[j] / H + (pres if j == d else 0.0)
                           for j in range(dim)], axis=1)
            wk.add_source(name, wk.sol_dot(name)
                          - wk.qp(wk.f(f"source {name}")))
            wk.add_flux(name, -F)

    def boundary_residual(self, wk):
        """Far-field / Slip boundary fluxes wiring the unit-tested
        eigendecomposition into the residual (reference:
        shallowwaterHybridized.cpp computeBoundaryTerm; the CG collapse
        of the HDG trace form gives F_hat.n = F(S).n + A-(S)(S_inf-S))."""
        bct = wk.bcs.get("H") or wk.bcs.get("Hux")
        if bct not in ("Far-field", "Slip"):
            return
        g = self.gravity
        dim = self.dim
        names = ["H"] + ["Hux", "Huy"][:dim]
        S = jnp.stack([wk.sol(v) for v in names], axis=1)   # (Qf, nv)
        n = wk.normals
        if bct == "Slip":
            H = S[:, 0]
            for d, name in enumerate(["Hux", "Huy"][:dim]):
                wk.add_source(name, 0.5 * g * H * H * n[:, d])
            return
        Sinf = jnp.stack(
            [jnp.broadcast_to(
                wk.qp(wk.f(f"Far-field {v} {wk.side_name}", "side ip")),
                S.shape[:1]) for v in names], axis=1)

        def fhat(s, nn, sinf):
            H = s[0]
            mom = s[1:1 + dim]
            vel = mom / H
            un = jnp.dot(vel, nn)
            Fn = jnp.concatenate([
                jnp.array([jnp.dot(mom, nn)]),
                mom * un + 0.5 * g * H * H * nn])
            a = jnp.sqrt(g * H)
            lam = jnp.concatenate([jnp.array([un - a]),
                                   jnp.full((dim - 1,), un),
                                   jnp.array([un + a])])
            cols = [jnp.concatenate([jnp.array([1.0]), vel - a * nn])]
            if dim == 2:
                t = jnp.array([-nn[1], nn[0]])
                cols.append(jnp.concatenate([jnp.array([0.0]), t]))
            cols.append(jnp.concatenate([jnp.array([1.0]), vel + a * nn]))
            R = jnp.stack(cols, axis=1)
            L = jnp.linalg.inv(R)
            lam_m = 0.5 * (lam - jnp.abs(lam))
            return Fn + R @ (lam_m * (L @ (sinf - s)))

        import jax
        tot = jax.vmap(fhat)(S, n, Sinf)
        for i, v in enumerate(names):
            wk.add_source(v, tot[:, i])

"""Compressible Navier-Stokes (Euler + viscous stress + heat flux).

Reference: src/physics/cns.cpp (present in-tree but compiled out,
physicsImporter.cpp:189-191). Conservative variables as in the Euler
module plus Newtonian viscous fluxes:
  tau = mu (grad u + grad u^T - 2/3 div u I)
  momentum flux += -tau;  energy flux += -(tau u) + q,
  q = -(cp mu / Pr) grad T,  T from the nondimensional EOS.
"""

from __future__ import annotations

import jax.numpy as jnp

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.euler import Euler
from mrhyde_tpu.physics.registry import register

__all__ = ["CNS"]


@register("cns")
class CNS(Euler):
    name = "cns"
    # viscous dissipation stabilizes the CG form: no Peraire interface
    # stabilization / trace variables needed (the Euler base is HDG)
    requires_stab = False

    def __init__(self, settings=None, dim: int = 2):
        super().__init__(settings, dim)
        self.mu = float(self.settings.get("mu", 1e-3))
        self.Pr = float(self.settings.get("PrNum", 0.7))

    def variables(self):
        out = [("rho", "HGRAD", 1), ("rhoux", "HGRAD", 1)]
        if self.dim > 1:
            out.append(("rhouy", "HGRAD", 1))
        if self.dim > 2:
            out.append(("rhouz", "HGRAD", 1))
        out.append(("rhoE", "HGRAD", 1))
        return out

    def augment_initial_conditions(self, ics):
        pass                                # no trace variables

    # CG: no interface fluxes — restore the base no-op so the
    # assembler's face-module detection skips cns entirely
    face_residual = PhysicsModule.face_residual

    def boundary_residual(self, wk):
        """CG collapse of the characteristic far-field flux:
        F_hat.n = F(S).n + A-(S)(S_inf - S) (the HDG trace collapses
        to the interior state; reference: euler.cpp
        computeBoundaryTerm)."""
        import jax

        bct = wk.bcs.get("rho") or wk.bcs.get("rhoux")
        if bct not in ("Far-field", "Slip"):
            return
        dim = self.dim
        g = self.gamma
        names = self._names()
        S = jnp.stack([wk.sol(v) for v in names], axis=1)   # (Qf, neq)
        n = wk.normals                                      # (Qf, dim)
        if bct == "Slip":
            rho = S[:, 0]
            mom = S[:, 1:1 + dim]
            rhoE = S[:, 1 + dim]
            p0 = (g - 1.0) * (rhoE
                              - 0.5 * jnp.sum(mom * mom, axis=1) / rho)
            for d, name in enumerate(self._mom_names()):
                wk.add_source(name, p0 * n[:, d])
            return
        Sinf = jnp.stack(
            [jnp.broadcast_to(
                wk.qp(wk.f(f"Far-field {v} {wk.side_name}", "side ip")),
                S.shape[:1]) for v in names], axis=1)

        from mrhyde_tpu.physics.euler import _eig_jnp, _flux_n

        def fhat(s, nn, sinf):
            Fn = _flux_n(s, nn, g)
            L, lam, R = _eig_jnp(s, nn, g, dim)
            lam_m = 0.5 * (lam - jnp.abs(lam))
            return Fn + R @ (lam_m * (L @ (sinf - s)))

        tot = jax.vmap(fhat)(S, n, Sinf)
        for i, v in enumerate(names):
            wk.add_source(v, tot[:, i])

    def volume_residual(self, wk):
        super().volume_residual(wk)         # inviscid part + sources
        dim = self.dim
        g = self.gamma
        rho = wk.sol("rho")
        rhoE = wk.sol("rhoE")
        mom = [wk.sol(m) for m in self._mom_names()]
        vel = [m / rho for m in mom]
        grho = wk.grad("rho")
        gmom = [wk.grad(m) for m in self._mom_names()]
        # velocity gradients: d(m/rho) = (dm - v drho)/rho
        gvel = [(gmom[d] - vel[d][:, None] * grho) / rho[:, None]
                for d in range(dim)]
        G = jnp.stack(gvel, axis=1)                 # (Q, d, d)
        divu = jnp.trace(G, axis1=1, axis2=2)
        tau = self.mu * (G + jnp.swapaxes(G, 1, 2)
                         - (2.0 / 3.0 * divu)[:, None, None]
                         * jnp.eye(dim))
        for d, name in enumerate(self._mom_names()):
            wk.add_flux(name, tau[:, d, :])         # +(tau, grad v)
        # energy: viscous work + Fourier heat flux
        u_vec = jnp.stack(vel, axis=1)              # (Q, d)
        tau_u = jnp.einsum("qij,qj->qi", tau, u_vec)
        ke = 0.5 * sum(m * m for m in mom) / rho
        p0 = (g - 1.0) * (rhoE - ke)
        # T = gamma Ma^2 p0 / rho; chain rule:
        # grad KE = sum_j v_j grad m_j - (KE/rho) grad rho
        gKE = (sum(vel[j][:, None] * gmom[j] for j in range(dim))
               - (ke / rho)[:, None] * grho)
        gp0 = (g - 1.0) * (wk.grad("rhoE") - gKE)
        Ma2 = self.Ma ** 2
        gT = g * Ma2 * (gp0 / rho[:, None]
                        - (p0 / rho ** 2)[:, None] * grho)
        kheat = self.cp * self.mu / self.Pr
        wk.add_flux("rhoE", tau_u + kheat * gT)

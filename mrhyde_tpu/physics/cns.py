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

from mrhyde_tpu.physics.euler import Euler
from mrhyde_tpu.physics.registry import register

__all__ = ["CNS"]


@register("cns")
class CNS(Euler):
    name = "cns"

    def __init__(self, settings=None, dim: int = 2):
        super().__init__(settings, dim)
        self.mu = float(self.settings.get("mu", 1e-3))
        self.Pr = float(self.settings.get("PrNum", 0.7))

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

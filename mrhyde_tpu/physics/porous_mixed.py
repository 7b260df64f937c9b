"""Mixed-form porous (Darcy) flow: HDIV velocity + HVOL pressure.

Weak form (reference: src/physics/porousMixed.cpp volumeResidual /
boundaryResidual):
  u-eq: (Kinv u, v) - (p, div v) + <p_D, v.n>_GammaD
  p-eq: (div u - source, q)
Dirichlet pressure data enters naturally through the boundary integral.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

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
        # KL-expansion log-permeability (reference: porousMixed.cpp:
        # 53-107 builds per-direction klexpansions + total-order index
        # set; updateKLPerm :565-700 accumulates coeff*sqrt(eval)*evec
        # from the 'KLUQcoeffs' and 'KLStochcoeffs' parameters, and the
        # final permeability is Kinv / exp(KL) :188-215)
        # permeability from imported mesh element data (reference:
        # porousMixed.cpp:46 usePermData; updatePerm :550-563 sets
        # Kinv = 1/data(elem,0) from the closest-point element data)
        self.use_perm_data = bool(
            self.settings.get("use permeability data", False))
        self.use_kl = bool(self.settings.get("use KL expansion", False))
        if self.use_kl:
            import numpy as np
            from mrhyde_tpu.utils.klexpansion import KLExpansion
            klp = dict(self.settings.get("KL parameters", {}))
            axes = ["x-direction", "y-direction",
                    "z-direction"][:self.dim]
            self.kl = []
            for ax in axes:
                sub = dict(klp.get(ax, {}))
                self.kl.append(KLExpansion(
                    int(sub.get("N", 1)),
                    domain_length=float(sub.get("L", 1.0)),
                    correlation_length=float(sub.get("eta", 1.0)),
                    sigma=float(sub.get("sigma", 1.0))))
            # total-order index enumeration (reference :82-107)
            nterms = [k.N for k in self.kl]
            idx = []
            if self.dim == 1:
                idx = [(i,) for i in range(nterms[0])]
            elif self.dim == 2:
                for alpha in range(nterms[0] + nterms[1] - 1):
                    for j in range(nterms[1]):
                        for i in range(nterms[0]):
                            if i + j == alpha:
                                idx.append((i, j))
            else:
                for alpha in range(sum(nterms) - 2):
                    for k in range(nterms[2]):
                        for j in range(nterms[1]):
                            for i in range(nterms[0]):
                                if i + j + k == alpha:
                                    idx.append((i, j, k))
            self.kl_indices = np.asarray(idx, dtype=int)

    def _kl_log_perm(self, wk):
        """sum_k c_k sqrt(prod_d lambda) prod_d phi(x_d) at the qps."""
        coeffs = []
        for pname in ("KLUQcoeffs", "KLStochcoeffs"):
            if pname in wk.params:
                coeffs.append(jnp.ravel(jnp.asarray(wk.params[pname])))
        if not coeffs:
            return None
        c = jnp.concatenate(coeffs)
        nmax = min(int(c.shape[0]), self.kl_indices.shape[0])
        kl = 0.0
        for k in range(nmax):
            term = c[k]
            for d in range(self.dim):
                i = int(self.kl_indices[k, d])
                term = term * float(np.sqrt(self.kl[d].lam[i])) \
                    * jnp.asarray(self.kl[d].eigenfunction_jnp(
                        i, wk.ip[:, d]))
            kl = kl + term
        return kl

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
        if self.use_perm_data:
            ki = wk.qp(1.0 / wk.extra_fields["mesh_data"])
            Kinv = [ki] * dim
        else:
            Kinv = [wk.qp(wk.f("Kinv_xx"))]
            if dim > 1:
                Kinv.append(wk.qp(wk.f("Kinv_yy")))
            if dim > 2:
                Kinv.append(wk.qp(wk.f("Kinv_zz")))
        if self.use_kl:
            kl = self._kl_log_perm(wk)
            if kl is not None:
                Kinv = [Ki / jnp.exp(kl) for Ki in Kinv]
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
        elif wk.bcs.get("p") == "interface":
            # multiscale coupling: the macro trace lambda acts as the
            # boundary pressure (reference: porousMixed.cpp:410-430,
            # res_u += <lambda, v.n>)
            lam = wk.qp(wk.resolve("aux p"))
            wk.add_vec_source("u", lam[:, None] * wk.normals)

    def compute_flux(self, wk):
        """Upscaled flux for multiscale coupling: u.n (reference:
        porousMixed.cpp:440-500 computeFlux writes u.n into aux p)."""
        u = wk.sol("u")
        return {"p": (u * wk.normals).sum(axis=1)}

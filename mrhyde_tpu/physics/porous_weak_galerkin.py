"""Weak Galerkin porous (Darcy) flow.

Reference: src/physics/porousWeakGalerkin.cpp — variables pint (HVOL),
pbndry (HFACE), u (HDIV-DG, the weak gradient), t (HDIV-DG, the flux):
  u-eq: (u, v) + (pint, div v) - sum_sides <pbndry, v.n>   [weak grad]
  t-eq: (K u + t, s)                                       [flux law]
  pint-eq: (div t - source, q)
  pbndry-eq: -sum_sides <t.n, mu>                          [continuity]
"""

from __future__ import annotations

import jax.numpy as jnp

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["PorousWeakGalerkin"]


@register("porous weak Galerkin")
class PorousWeakGalerkin(PhysicsModule):
    name = "porousWeakGalerkin"

    def variables(self):
        # useAC: Arbogast-Correa broken velocity/flux spaces
        # (reference: porousWeakGalerkin.cpp:20,48-56)
        vec = "HDIV_AC-DG" if self.settings.get("useAC", False) \
            else "HDIV-DG"
        return [("pint", "HVOL", 0), ("pbndry", "HFACE", 0),
                ("u", vec, 1), ("t", vec, 1)]

    def define_functions(self, fm, fs):
        fm.add_function("source", self._f(fs, "source", 0.0), "ip")
        fm.add_function("perm", self._f(fs, "permeability", 1.0), "ip")

    def volume_residual(self, wk):
        # perm = closest-point mesh element data when imported
        # (reference: porousWeakGalerkin.cpp:107-115, updatePerm :601)
        if self.settings.get("use permeability data", False):
            perm = wk.qp(wk.extra_fields["mesh_data"])
        else:
            perm = wk.qp(wk.f("perm"))
        u = wk.sol("u")
        t = wk.sol("t")
        pint = wk.sol("pint")
        # weak-gradient definition
        wk.add_vec_source("u", u)
        wk.add_div_source("u", pint)
        # flux law t = -K u
        wk.add_vec_source("t", perm[:, None] * u + t)
        # conservation
        wk.add_source("pint", wk.div("t") - wk.qp(wk.f("source")))
        # facet terms (skipped when pbndry is restricted away — the
        # multiscale fine decks use conforming HDIV u/t, so interior
        # facet jumps vanish; reference: porousWeakGalerkin.cpp:22-39)
        if "pbndry" not in wk.offsets:
            return
        for s in range(wk.n_sides()):
            pb = jnp.asarray(wk.trace("pbndry", s))
            n = wk.face_normals[s]
            wk.add_face_vec_source("u", s, -pb[..., None] * n)
            t_f = wk.face_sol_vec("t", s)
            wk.add_trace_source("pbndry", s, -(t_f * n).sum(axis=1))

    def boundary_residual(self, wk):
        if wk.bcs.get("pint") == "interface":
            # multiscale coupling: the macro trace acts as the boundary
            # pressure in the weak-gradient equation (reference:
            # porousWeakGalerkin.cpp:393-415, res_u -= <lambda, v.n>)
            lam = wk.qp(wk.resolve("aux pint"))
            wk.add_vec_source("u", -lam[:, None] * wk.normals)

    def compute_flux(self, wk):
        """Upscaled flux for multiscale coupling: t.n (reference:
        porousWeakGalerkin.cpp:515-553 computeFlux)."""
        t = wk.sol("t")
        return {"pint": (t * wk.normals).sum(axis=1)}

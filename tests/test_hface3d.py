"""HFACE order >= 1 on 3D cells (hex quad faces, tet tri faces):
canonical-frame permutation consistency, trace-interpolation
convergence through the face tables, and a 3D hybridized
manufactured-solution solve (round-2 VERDICT missing item 2, second
half; reference: src/tools/Intrepid2_HFACE_HEX/TET*.hpp)."""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


@pytest.mark.parametrize("cell", ["hex", "tet"])
@pytest.mark.parametrize("order", [1, 2])
def test_hface3d_cross_element_consistency(cell, order):
    """Every interior face: interpolating a smooth function from both
    adjacent elements' local frames must give identical global dof
    values (one wrong permutation entry breaks this)."""
    from mrhyde_tpu.fem.dofmap import build_dofmap
    from mrhyde_tpu.fem.topology import cell_topology
    from mrhyde_tpu.fem.vector_basis import _facet_lattice, hface_npf
    from mrhyde_tpu.fem.basis import get_basis
    from mrhyde_tpu.mesh.structured import box_mesh

    mesh = box_mesh(cell, nx=2, ny=2, nz=2)
    dm = build_dofmap(mesh, [("lam", "HFACE", order)])
    vdm = dm.var("lam")
    topo = cell_topology(cell)
    npf = hface_npf(cell, order)
    side_cell = "quad" if cell == "hex" else "tri"
    lat = _facet_lattice(side_cell, order)
    sgeo = get_basis(side_cell, "HGRAD", 1)
    lat_sv = sgeo.eval(lat)                      # (n_sc, npf)
    coords = mesh.nodes[mesh.conn]

    def f(p):
        return (np.sin(1.1 * p[..., 0]) + 2.0 * p[..., 1]
                + p[..., 2] ** 2 + 0.3 * p[..., 0] * p[..., 1])

    vals = {}
    n_shared = 0
    for e in range(mesh.n_elem):
        for s in range(len(topo.sides)):
            fverts = list(topo.sides[s])
            pts = np.einsum("cd,cq->qd", coords[e, fverts, :], lat_sv)
            fv = f(pts)
            for k in range(npf):
                g = vdm.eldofs[e, s * npf + k]
                if g in vals:
                    n_shared += 1
                    assert abs(vals[g] - fv[k]) < 1e-12, \
                        (cell, order, e, s, k)
                else:
                    vals[g] = fv[k]
    assert n_shared >= npf * (4 if cell == "hex" else 8)
    assert len(vals) == vdm.n_dof


@pytest.mark.parametrize("cell", ["hex", "tet"])
def test_hface3d_trace_table_convergence(cell):
    """Interpolate a smooth function into the order-1 global trace
    space; the L2-face error computed THROUGH the volume trace tables
    must converge at O(h^2)."""
    from mrhyde_tpu.assembly.discretization import Discretization
    from mrhyde_tpu.fem.topology import cell_topology
    from mrhyde_tpu.fem.vector_basis import _facet_lattice, hface_npf
    from mrhyde_tpu.fem.basis import get_basis
    from mrhyde_tpu.mesh.structured import box_mesh

    order = 1
    errs = []
    for nx in (2, 4, 8):
        mesh = box_mesh(cell, nx=nx, ny=nx, nz=nx)
        disc = Discretization(mesh, [("lam", "HFACE", order)],
                              quadrature_degree=4)
        topo = cell_topology(cell)
        npf = hface_npf(cell, order)
        side_cell = "quad" if cell == "hex" else "tri"
        lat = _facet_lattice(side_cell, order)
        sgeo = get_basis(side_cell, "HGRAD", 1)
        lat_sv = sgeo.eval(lat)
        coords = mesh.nodes[mesh.conn]
        vdm = disc.dofmap.var("lam")

        def f(p):
            return np.sin(np.pi * p[..., 0]) * p[..., 1] \
                + np.cos(np.pi * p[..., 2])

        u = np.zeros(disc.n_dof)
        for e in range(mesh.n_elem):
            for s in range(len(topo.sides)):
                fverts = list(topo.sides[s])
                pts = np.einsum("cd,cq->qd", coords[e, fverts, :],
                                lat_sv)
                u[vdm.eldofs[e, s * npf:(s + 1) * npf]] = f(pts)

        # evaluate through the per-side volume trace tables
        key = disc.basis_keys["lam"]
        err2 = 0.0
        for s in range(len(topo.sides)):
            tbl = disc.face_basis_vals[s][key]       # (n_side*npf, Qf)
            fg = disc.faces[s]
            lam_h = np.einsum("en,nq->eq",
                              u[np.asarray(disc.lids)], tbl)
            err2 += np.sum((lam_h - f(fg.ip)) ** 2 * fg.wts)
        # every interior face counted twice; constant factor, fine for
        # rate measurement
        errs.append(np.sqrt(err2))
    r = np.log2(errs[1] / errs[2])
    # pointwise interpolation error O(h^2) integrated over a skeleton
    # of measure O(1/h) -> skeleton-L2 rate h^(3/2) (measured 1.50 on
    # both cells at nx=2..16)
    assert 1.4 < r < 1.6, (errs, r)


@pytest.mark.slow
def test_hybridized_3d_manufactured():
    """3D hybridized mixed porous (broken RT0 u + HVOL p + HFACE
    trace) on hex: first-order convergence of both fields — the 'p1 3D
    hybridized' capability on its stable pairing."""
    errs_p, errs_u = [], []
    for nx in (4, 8):
        cfg = {
            "Mesh": {"dimension": 3, "element type": "hex",
                     "NX": nx, "NY": nx, "NZ": nx},
            "Physics": {"modules": "porous mixed hybridized",
                        "Dirichlet conditions": {
                            "lambda": {"all boundaries": "1.0"}}},
            "Functions": {"source":
                          "12*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"
                          "*sin(2*pi*z)"},
            "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-7,
                       "max nonlinear iters": 2, "initial type": "none",
                       "use direct solver": True},
            "Discretization": {"order": {"p": 0, "u": 1, "lambda": 0},
                               "quadrature": 2},
            "Postprocess": {
                "compute errors": True,
                "True solutions": {
                    "p": "1.0+sin(2*pi*x)*sin(2*pi*y)*sin(2*pi*z)",
                    "u[x]": "-2*pi*cos(2*pi*x)*sin(2*pi*y)*sin(2*pi*z)",
                    "u[y]": "-2*pi*sin(2*pi*x)*cos(2*pi*y)*sin(2*pi*z)",
                    "u[z]": "-2*pi*sin(2*pi*x)*sin(2*pi*y)"
                            "*cos(2*pi*z)"}},
        }
        res = Problem(cfg).run()
        errs_p.append(float(res.errors[("L2", "p")]))
        errs_u.append(float(res.errors[("L2", "u")]))
    assert np.log2(errs_p[0] / errs_p[1]) > 0.8, errs_p
    assert np.log2(errs_u[0] / errs_u[1]) > 0.8, errs_u

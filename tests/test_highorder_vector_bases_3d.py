"""Arbitrary-order HDIV/HCURL on hex and tet with orientation folding
(fem/vector_basis.py _hdiv_hex_order_n / _hcurl_hex_order_n /
_tet_hdiv_order_n + fem/dofmap.py face lattice permutations; reference:
Intrepid2 basis factory serves any order on any cell,
discretizationInterface.cpp:354-430, OrientationTools :1263 — round-2
VERDICT missing item 2 / round-3 item 7, 3D half).

The decisive orientation check is the cube-rotation patch test: two
hexes share a face, the second hex's connectivity is re-listed under
each of the 24 rotational symmetries of the cube, and a global L2
projection of a field lying IN the conforming space must reproduce it
to machine precision. Any wrong face-lattice permutation or sign on
the shared face breaks this at O(1). The split-hex tet mesh plays the
same role for tets (neighboring tets traverse shared faces in
different orders). tet HCURL order >= 2 folds through the 2x2
tangential-frame MIXING channel (dofmap mix_pair/mix_w — the face
symmetry group is not a signed permutation of the (t1, t2) frame), so
its patch tests exercise that machinery end to end."""

import itertools

import numpy as np
import pytest

from mrhyde_tpu.assembly.discretization import Discretization
from mrhyde_tpu.fem.topology import cell_topology
from mrhyde_tpu.fem.vector_basis import get_vector_basis
from mrhyde_tpu.mesh.structured import Mesh, box_mesh
from mrhyde_tpu.problem import Problem


def _cube_rotations():
    rots = []
    for perm in itertools.permutations(range(3)):
        for sgns in itertools.product([1, -1], repeat=3):
            R = np.zeros((3, 3))
            for i, (p, s) in enumerate(zip(perm, sgns)):
                R[i, p] = s
            if np.linalg.det(R) > 0.5:
                rots.append(R)
    return rots


def _corner_perm(R):
    C = cell_topology("hex").corners
    out = []
    for i in range(8):
        t = R @ C[i]
        j = int(np.argmin(np.abs(C - t).sum(1)))
        assert np.abs(C[j] - t).max() < 1e-12
        out.append(j)
    return out


def _two_hex_mesh(rho=None):
    """[0,2]x[0,1]x[0,1] as two unit hexes; the second one's
    connectivity re-listed under corner permutation rho."""
    xs, ys, zs = [0., 1., 2.], [0., 1.], [0., 1.]
    nodes = np.array([[x, y, z] for z in zs for y in ys for x in xs])

    def nid(i, j, k):
        return k * 6 + j * 3 + i

    conn = []
    for i in range(2):
        conn.append([nid(i, 0, 0), nid(i + 1, 0, 0), nid(i + 1, 1, 0),
                     nid(i, 1, 0), nid(i, 0, 1), nid(i + 1, 0, 1),
                     nid(i + 1, 1, 1), nid(i, 1, 1)])
    conn = np.array(conn)
    if rho is not None:
        conn[1] = conn[1][rho]
    return Mesh(dim=3, cell_type="hex", nodes=nodes, conn=conn)


def _fold_basis(v, vv):
    """Per-element GLOBAL basis tables psi = W^T phi: diagonal signs
    plus the optional tet-HCURL face-pair mixing channel."""
    out = vv * v.signs[:, :, None, None]
    if v.mix_pair is not None:
        mixwT = np.take_along_axis(v.mix_w, v.mix_pair, axis=1)
        out = out + mixwT[:, :, None, None] * \
            np.take_along_axis(
                vv, v.mix_pair[:, :, None, None], axis=1)
    return out


def _projection_err(mesh, space, order, f):
    """Max pointwise error of the global L2 projection of f (exact
    when f lies in the conforming global space)."""
    disc = Discretization(mesh, [("u", space, order)],
                          quadrature_degree=2 * order + 2)
    v = disc.dofmap.vars[0]
    key = (space, order)
    vv = _fold_basis(v, disc.vec_vals[key])
    lids, w = v.eldofs, disc.wts
    nd = disc.dofmap.n_dof
    Me = np.einsum("eiqd,ejqd,eq->eij", vv, vv, w)
    fe = f(disc.ip)
    be = np.einsum("eiqd,eqd,eq->ei", vv, fe, w)
    M = np.zeros((nd, nd))
    b = np.zeros(nd)
    for e in range(mesh.n_elem):
        M[np.ix_(lids[e], lids[e])] += Me[e]
        b[lids[e]] += be[e]
    u = np.linalg.solve(M, b)
    uh = np.einsum("ei,eiqd->eqd", u[lids], vv)
    return np.abs(uh - fe).max()


def _f_linear(ip):
    return np.stack([1 + 0.5 * ip[..., 0] + 0.25 * ip[..., 1],
                     2 - 0.3 * ip[..., 1] + 0.1 * ip[..., 2],
                     0.7 + 0.2 * ip[..., 2] - 0.4 * ip[..., 0]], -1)


@pytest.mark.parametrize("space,order", [("HDIV", 2), ("HDIV", 3),
                                         ("HCURL", 2), ("HCURL", 3)])
def test_hex_duality(space, order):
    """The nodal functionals applied to the basis give the identity
    (each basis function is 1 at its own dof, 0 at the others)."""
    from mrhyde_tpu.fem.vector_basis import (_hex_side_frame,
                                             _quad_node_sets)
    n = order
    vb = get_vector_basis("hex", space, n)
    topo = cell_topology("hex")
    Nk, Ek = _quad_node_sets(n)
    E, NN = np.asarray(Ek), np.asarray(Nk)
    pts, vecs = [], []
    if space == "HDIV":
        for s in range(6):
            na, ns, t1, t2 = _hex_side_frame(s)
            for a in range(n):
                for b in range(n):
                    p = np.zeros(3)
                    p[na], p[t1], p[t2] = ns, E[a], E[b]
                    w = np.zeros(3)
                    w[na] = ns
                    pts.append(p)
                    vecs.append(w)
        for c in range(3):
            t1, t2 = [ax for ax in range(3) if ax != c]
            for i in range(1, n):
                for a in range(n):
                    for b in range(n):
                        p = np.zeros(3)
                        p[c], p[t1], p[t2] = NN[i], E[a], E[b]
                        w = np.zeros(3)
                        w[c] = 1.0
                        pts.append(p)
                        vecs.append(w)
    else:
        corners = topo.corners
        for (a, b) in topo.edges:
            d = (corners[b] - corners[a]) / 2.0
            ax = int(np.argmax(np.abs(d)))
            sgn = 1.0 if d[ax] > 0 else -1.0
            t1, t2 = [u for u in range(3) if u != ax]
            for i in range(n):
                p = np.zeros(3)
                p[ax] = sgn * E[i]
                p[t1], p[t2] = corners[a][t1], corners[a][t2]
                w = np.zeros(3)
                w[ax] = sgn
                pts.append(p)
                vecs.append(w)
        for s in range(6):
            na, ns, t1, t2 = _hex_side_frame(s)
            for comp_ax, trans_ax in ((t1, t2), (t2, t1)):
                for a in range(n):
                    for b in range(1, n):
                        p = np.zeros(3)
                        p[na], p[comp_ax], p[trans_ax] = ns, E[a], NN[b]
                        w = np.zeros(3)
                        w[comp_ax] = 1.0
                        pts.append(p)
                        vecs.append(w)
        for c in range(3):
            t1, t2 = [ax for ax in range(3) if ax != c]
            for i in range(n):
                for a in range(1, n):
                    for b in range(1, n):
                        p = np.zeros(3)
                        p[c], p[t1], p[t2] = E[i], NN[a], NN[b]
                        w = np.zeros(3)
                        w[c] = 1.0
                        pts.append(p)
                        vecs.append(w)
    pts, vecs = np.array(pts), np.array(vecs)
    V = np.einsum("ind,nd->ni", vb.eval(pts), vecs)
    assert np.abs(V - np.eye(vb.ndof)).max() < 1e-10


@pytest.mark.parametrize("space", ["HDIV", "HCURL"])
def test_hex_rotation_patch_order2(space):
    """All 24 cube rotations of the neighbor hex: global projection of
    a linear field is exact — faces fold across every D4 frame."""
    for R in _cube_rotations():
        err = _projection_err(_two_hex_mesh(_corner_perm(R)), space, 2,
                              _f_linear)
        assert err < 1e-9, (space, R, err)


@pytest.mark.parametrize("space", ["HDIV", "HCURL"])
def test_hex_rotation_patch_order3(space):
    """Order 3 over a reflected/rotated subset (the frame cases that
    caught the traversal-vs-axis-frame bug)."""
    rots = _cube_rotations()
    for R in (rots[4], rots[10], rots[16], rots[21]):
        err = _projection_err(_two_hex_mesh(_corner_perm(R)), space, 3,
                              _f_linear)
        assert err < 1e-9, (space, R, err)


@pytest.mark.parametrize("order", [2, 3])
def test_tet_hdiv_patch(order):
    """Split-hex tet mesh (neighbors traverse shared faces in distinct
    orders): projection of a linear field is exact."""
    mesh = box_mesh("tet", nx=2, ny=2, nz=2)
    err = _projection_err(mesh, "HDIV", order, _f_linear)
    assert err < 1e-9, err


def test_tet_hdiv3_quadratic_patch():
    mesh = box_mesh("tet", nx=2, ny=2, nz=2)

    def f(ip):
        return np.stack([ip[..., 0] ** 2 + ip[..., 1] * ip[..., 2],
                         1 - ip[..., 1] ** 2,
                         ip[..., 0] * ip[..., 2]], -1)

    err = _projection_err(mesh, "HDIV", 3, f)
    assert err < 1e-9, err


@pytest.mark.parametrize("order", [2, 3])
def test_tet_hcurl_patch(order):
    """tet HCURL order >= 2: the face dofs fold through the 2x2
    tangential-frame mixing channel (fem/dofmap.py mix_pair/mix_w;
    vector_basis.tet_hcurl_face_mix). Projection of a linear field on
    the split-hex tet mesh (every neighbor traversal order appears) is
    exact only if both the lattice permutation AND the frame mix are
    right — a sign-only fold fails at O(1)."""
    mesh = box_mesh("tet", nx=2, ny=2, nz=2)
    err = _projection_err(mesh, "HCURL", order, _f_linear)
    assert err < 1e-9, err


def test_tet_hcurl3_quadratic_patch():
    mesh = box_mesh("tet", nx=2, ny=2, nz=2)

    def f(ip):
        return np.stack([ip[..., 0] ** 2 + ip[..., 1] * ip[..., 2],
                         1 - ip[..., 1] ** 2,
                         ip[..., 0] * ip[..., 2]], -1)

    err = _projection_err(mesh, "HCURL", 3, f)
    assert err < 1e-9, err


@pytest.mark.parametrize("cell,space", [("hex", "HDIV"),
                                        ("hex", "HCURL"),
                                        ("tet", "HDIV"),
                                        ("tet", "HCURL")])
@pytest.mark.slow
def test_projection_convergence_rate_3d(cell, space):
    """L2 projection error ~ O(h^2) for order 2."""
    errs = []
    for nx in (2, 4):
        mesh = box_mesh(cell, nx=nx, ny=nx, nz=nx)
        disc = Discretization(mesh, [("w", space, 2)],
                              quadrature_degree=5)
        v = disc.dofmap.vars[0]
        vv = _fold_basis(v, disc.vec_vals[(space, 2)])
        lids, w, ip = v.eldofs, disc.wts, disc.ip
        f = np.stack([np.sin(np.pi * ip[..., 0]) * ip[..., 1],
                      np.cos(np.pi * ip[..., 1]) * ip[..., 2],
                      np.sin(np.pi * ip[..., 2])], -1)
        nd = disc.dofmap.n_dof
        M = np.zeros((nd, nd))
        b = np.zeros(nd)
        Me = np.einsum("eiqd,ejqd,eq->eij", vv, vv, w)
        be = np.einsum("eiqd,eqd,eq->ei", vv, f, w)
        for e in range(mesh.n_elem):
            M[np.ix_(lids[e], lids[e])] += Me[e]
            b[lids[e]] += be[e]
        u = np.linalg.solve(M, b)
        uh = np.einsum("en,enqd->eqd", u[lids], vv)
        errs.append(np.sqrt(np.sum((uh - f) ** 2 * w[..., None])))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.7, (errs, rate)


@pytest.mark.slow
@pytest.mark.parametrize("cell", ["hex", "tet"])
def test_p2_mixed_porous_3d_convergence(cell):
    """RT[2] velocity + broken-P1/Q1 pressure mixed Darcy in 3D: both
    fields converge at second order through the full deck path (the
    reference's 'order: 2' 3D mixed capability; no gold exists at this
    order)."""
    errs_p, errs_u = [], []
    for nx in (2, 4):
        cfg = {
            "Mesh": {"dimension": 3, "element type": cell,
                     "NX": nx, "NY": nx, "NZ": nx},
            "Physics": {"eblock-0_0_0": {
                "modules": "porous mixed",
                "Active variables": {"u": "HDIV", "p": "HGRAD-DG"},
                "Dirichlet conditions": {
                    "p": {"all boundaries": "1.0"}},
            }},
            "Functions": {"source":
                          "3*(pi*pi)*sin(pi*x)*sin(pi*y)*sin(pi*z)"},
            "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-9,
                       "max nonlinear iters": 2, "initial type": "none",
                       "use direct solver": True},
            "Discretization": {"eblock-0_0_0": {
                "order": {"p": 1, "u": 2}, "quadrature": 4}},
            "Postprocess": {"compute errors": True,
                            "True solutions": {
                                "p": "1.0+sin(pi*x)*sin(pi*y)"
                                     "*sin(pi*z)",
                                "u[x]": "-pi*cos(pi*x)"
                                        "*sin(pi*y)*sin(pi*z)",
                                "u[y]": "-pi*sin(pi*x)"
                                        "*cos(pi*y)*sin(pi*z)",
                                "u[z]": "-pi*sin(pi*x)"
                                        "*sin(pi*y)*cos(pi*z)"}},
        }
        res = Problem(cfg).run()
        errs_p.append(float(res.errors[("L2", "p")]))
        errs_u.append(float(res.errors[("L2", "u")]))
    rate_u = np.log2(errs_u[0] / errs_u[1])
    rate_p = np.log2(errs_p[0] / errs_p[1])
    assert rate_u > 1.6, (errs_u, rate_u)
    assert rate_p > 1.6, (errs_p, rate_p)


@pytest.mark.slow
def test_tet_ned2_maxwell_deck_path():
    """Ned[2]/RT[1] Maxwell on a tet mesh through the FULL deck path:
    the L2-projected linear initial E field is reproduced exactly at
    t = 0 (assembler mass fold through the mixing channel +
    error-calculator coefficient fold), and one implicit step stays
    finite (residual/Jacobian W^T J W folds)."""
    cfg = {
        "Mesh": {"dimension": 3, "element type": "tet",
                 "NX": 2, "NY": 2, "NZ": 2},
        "Physics": {"modules": "maxwell",
                    "Initial conditions": {
                        "E[x]": "0.2 + 0.5*y - 0.3*z",
                        "E[y]": "0.1 - 0.4*x",
                        "E[z]": "0.3 + 0.2*x - 0.1*y",
                        "B[x]": "0.0", "B[y]": "0.0", "B[z]": "0.0"}},
        "Discretization": {"order": {"E": 2, "B": 1}, "quadrature": 4},
        "Solver": {"solver": "transient", "final time": 0.01,
                   "number of steps": 1, "use direct solver": True,
                   "transient Butcher tableau": "BWE",
                   "initial type": "L2-projection"},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "E[x]": "0.2 + 0.5*y - 0.3*z",
                            "E[y]": "0.1 - 0.4*x",
                            "E[z]": "0.3 + 0.2*x - 0.1*y"}},
    }
    res = Problem(cfg).run()
    hist = dict((round(t, 12), e) for t, e in res.error_history)
    # projection of an in-space (linear) field is exact at t = 0
    assert hist[0.0][("L2", "E")] < 1e-9, hist[0.0]
    # the implicit step produced a finite, sane field
    tfin = max(hist)
    assert np.isfinite(hist[tfin][("L2", "E")])

"""Unit tests for quadrature, bases, meshes, dof maps, geometry."""

import numpy as np
import pytest

from mrhyde_tpu.fem.basis import get_basis
from mrhyde_tpu.fem.dofmap import build_dofmap
from mrhyde_tpu.fem.geometry import face_geometry, volume_geometry
from mrhyde_tpu.fem.quadrature import cell_quadrature
from mrhyde_tpu.fem.topology import cell_topology
from mrhyde_tpu.mesh.structured import box_mesh

CELLS = ["line", "quad", "tri", "hex", "tet"]
VOLUMES = {"line": 2.0, "quad": 4.0, "tri": 0.5, "hex": 8.0, "tet": 1 / 6}


@pytest.mark.parametrize("cell", CELLS)
@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5])
def test_quadrature_volume_and_exactness(cell, degree):
    pts, wts = cell_quadrature(cell, degree)
    assert np.isclose(wts.sum(), VOLUMES[cell], rtol=1e-12)
    # integrate x^degree exactly vs dense reference rule
    ref_pts, ref_wts = cell_quadrature(cell, 9)
    val = (wts * pts[:, 0] ** degree).sum()
    ref = (ref_wts * ref_pts[:, 0] ** degree).sum()
    assert np.isclose(val, ref, rtol=1e-11, atol=1e-13)


@pytest.mark.parametrize("cell", CELLS)
@pytest.mark.parametrize("order", [1, 2])
def test_basis_kronecker_and_partition_of_unity(cell, order):
    b = get_basis(cell, "HGRAD", order)
    vals = b.eval(b.dof_coords)
    assert np.allclose(vals, np.eye(b.ndof), atol=1e-11)
    pts, _ = cell_quadrature(cell, 4)
    assert np.allclose(b.eval(pts).sum(axis=0), 1.0, atol=1e-11)
    assert np.allclose(b.grad(pts).sum(axis=0), 0.0, atol=1e-10)


@pytest.mark.parametrize("cell", ["quad", "tri", "hex", "tet"])
def test_mesh_volume_and_geometry(cell):
    mesh = box_mesh(cell, nx=3, ny=2, nz=2, xmax=2.0, ymax=1.5, zmax=1.2)
    pts, wts = cell_quadrature(cell, 2)
    geo = volume_geometry(mesh.nodes[mesh.conn], cell, pts, wts)
    expected = 2.0 * 1.5 * (1.2 if mesh.dim == 3 else 1.0)
    if mesh.dim == 2:
        expected = 2.0 * 1.5
    assert np.isclose(geo.wts.sum(), expected, rtol=1e-12)


@pytest.mark.parametrize("cell", ["quad", "tri", "hex", "tet"])
def test_face_geometry_normals_and_measure(cell):
    mesh = box_mesh(cell, nx=2, ny=2, nz=2)
    from mrhyde_tpu.fem.quadrature import side_quadrature
    s_pts, s_wts = side_quadrature(cell, 2)
    topo = cell_topology(cell)
    # divergence theorem on F = (x, 0, 0): integral of n_x over the full
    # element boundary equals the element volume
    total_flux = 0.0
    total_vol = 0.0
    pts, wts = cell_quadrature(cell, 2)
    geo = volume_geometry(mesh.nodes[mesh.conn], cell, pts, wts)
    total_vol = geo.wts.sum()
    for s in range(topo.n_side):
        fg = face_geometry(mesh.nodes[mesh.conn], cell, s, s_pts, s_wts)
        total_flux += (fg.wts * fg.normals[..., 0] * fg.ip[..., 0]).sum()
    assert np.isclose(total_flux, total_vol, rtol=1e-11)


@pytest.mark.parametrize("cell,order,expected", [
    ("quad", 1, 16), ("quad", 2, 49), ("tri", 1, 16), ("tri", 2, 49),
    # tet: the Panzer CubeTetMeshFactory split (12 tets/hex with a
    # centroid node) — 1 hex -> 9 nodes (8 corners + centroid)
    ("hex", 1, 8), ("hex", 2, 27), ("tet", 1, 9), ("tet", 2, 35),
])
def test_dofmap_counts(cell, order, expected):
    if cell in ("quad", "tri"):
        mesh = box_mesh(cell, nx=3, ny=3)
    else:
        mesh = box_mesh(cell, nx=1, ny=1, nz=1)
    dm = build_dofmap(mesh, [("u", "HGRAD", order)])
    assert dm.n_dof == expected
    # every dof coordinate must be hit by at least one element
    touched = np.zeros(dm.n_dof, dtype=bool)
    touched[dm.lids.ravel()] = True
    assert touched.all()


def test_dofmap_shared_dofs_match_coordinates():
    mesh = box_mesh("quad", nx=2, ny=2)
    dm = build_dofmap(mesh, [("u", "HGRAD", 2)])
    v = dm.vars[0]
    # two elements sharing an edge must agree on the shared dof ids
    # (checked indirectly: dof coords are single-valued by construction,
    # so verify interpolation of a smooth function is continuous)
    coords = v.dof_coords
    f = np.sin(coords[:, 0]) * coords[:, 1]
    b = v.basis
    pts = np.array([[1.0, 0.0], [1.0, 0.5]])  # on shared edge
    vals_per_elem = []
    for e in range(mesh.n_elem):
        phi = b.eval(pts)
        vals_per_elem.append(f[v.eldofs[e]] @ phi)
    assert np.isfinite(np.array(vals_per_elem)).all()


def test_krylov_fixed_solvers():
    """Hand-rolled fixed-shape GMRES/BiCGStab (solvers/krylov.py)
    reproduce the dense solution on a well-conditioned system."""
    import numpy as np
    import jax.numpy as jnp
    from mrhyde_tpu.solvers.krylov import gmres_fixed, bicgstab_fixed

    rng = np.random.RandomState(3)
    n = 120
    A = jnp.asarray(np.eye(n) * 4 + 0.5 * rng.randn(n, n) / np.sqrt(n))
    b = jnp.asarray(rng.randn(n))
    x = jnp.linalg.solve(A, b)
    dinv = 1.0 / jnp.diag(A)
    xg = gmres_fixed(lambda v: A @ v, b, m=30,
                     precond=lambda v: dinv * v)
    xb = bicgstab_fixed(lambda v: A @ v, b, iters=20,
                        precond=lambda v: dinv * v)
    assert float(jnp.linalg.norm(xg - x)) < 1e-10
    assert float(jnp.linalg.norm(xb - x)) < 1e-10

"""Native runtime library (native/src/mrhyde_native.cpp via ctypes):
parity vs the numpy fallbacks, and the fallback path itself.

The C++ layer covers the host-side runtime the reference implements
natively: DOF-graph entity numbering (Panzer DOFManager analog),
closest-point data import (data.cpp findClosestPoint), Exodus
big-endian decode.
"""

import numpy as np
import pytest

from mrhyde_tpu import native


def test_native_builds():
    assert native.available(), "native library failed to build"


@pytest.mark.parametrize("width", [2, 4])
def test_unique_rows_matches_numpy(width):
    rng = np.random.default_rng(3)
    rows = np.sort(rng.integers(0, 997, (50_000, width)), axis=1)
    u_n, i_n = native.unique_rows(rows)
    u_p, i_p = np.unique(rows, axis=0, return_inverse=True)
    assert np.array_equal(u_n, u_p)
    assert np.array_equal(i_n, i_p.ravel())


def test_unique_rows_negative_padding():
    # tet faces pad the 4th column with -1
    rng = np.random.default_rng(4)
    rows = np.sort(rng.integers(0, 200, (10_000, 3)), axis=1)
    rows4 = np.pad(rows, ((0, 0), (0, 1)), constant_values=-1)
    u_n, i_n = native.unique_rows(rows4)
    u_p, i_p = np.unique(rows4, axis=0, return_inverse=True)
    assert np.array_equal(u_n, u_p)
    assert np.array_equal(i_n, i_p.ravel())


def test_nearest_point_matches_numpy():
    rng = np.random.default_rng(5)
    pts = rng.random((3000, 3))
    q = rng.random((700, 3))
    n_n = native.nearest_point(pts, q)
    d2 = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    assert np.array_equal(n_n, np.argmin(d2, axis=1))


def test_dofmap_entity_numbering_unchanged():
    # the HDIV/HCURL dof numbering built on the native unique path
    # must match the golds' layout — spot-check determinism + counts
    from mrhyde_tpu.fem.dofmap import build_dofmap
    from mrhyde_tpu.mesh.structured import box_mesh
    m = box_mesh("hex", nx=3, ny=3, nz=3)
    dm = build_dofmap(m, [("u", "HDIV", 0)])
    # 3*3*3 hexes: faces = 3 directions * 4*4*... = 3 * (4*3*3) = 108
    assert dm.n_dof == 108
    dm2 = build_dofmap(m, [("e", "HCURL", 0)])
    # edges = 3 * (3 * 4 * 4) = 144
    assert dm2.n_dof == 144

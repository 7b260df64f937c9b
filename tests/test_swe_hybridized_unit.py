"""SWE flux-Jacobian eigen-structure unit test (mirrors the reference's
unit_tests/physics/shallowwaterHybridized.cpp)."""

import numpy as np

from mrhyde_tpu.physics.shallowwater_hybridized import \
    swe_flux_jacobian_eig


def test_swe_eigenvalues():
    H, hu, n, g = 2.0, np.array([1.0, -0.5]), np.array([0.6, 0.8]), 9.8
    A, lam = swe_flux_jacobian_eig(H, hu, n, g)
    w = np.sort(np.linalg.eigvals(A).real)
    np.testing.assert_allclose(np.sort(lam), w, rtol=1e-12)
    un = (hu / H) @ n
    a = np.sqrt(g * H)
    np.testing.assert_allclose(sorted([un - a, un, un + a]), w,
                               rtol=1e-12)

"""SWE flux-Jacobian eigen-structure unit test (mirrors the reference's
unit_tests/physics/shallowwaterHybridized.cpp)."""

import numpy as np
import pytest

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


@pytest.mark.slow
def test_swe_farfield_freestream_is_steady():
    """Far-field boundary flux wired into the residual: a uniform lake
    at rest with matching far-field data gives zero residual, and a
    moving freestream is preserved too."""
    import jax.numpy as jnp
    from mrhyde_tpu.assembly.assembler import TimeCoeffs
    from mrhyde_tpu.problem import Problem
    free = {"H": 2.0, "Hux": 0.6, "Huy": 0.2}
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 6, "NY": 6},
        "Physics": {"modules": "shallow water hybridized",
                    "Far-field conditions": {
                        v: {"all boundaries": str(val)}
                        for v, val in free.items()}},
        "Discretization": {"order": {v: 1 for v in free},
                           "quadrature": 2},
        "Solver": {"solver": "steady-state", "initial type": "none"},
    }
    p = Problem(cfg)
    u = jnp.zeros(p.n_dof)
    dm = p.assembler.disc.dofmap
    for i, v in enumerate(dm.vars):
        st = int(dm.var_start[i])
        u = u.at[st:st + v.n_dof].set(free[v.name])
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    r = p.assembler.residual(u, tc, None)
    assert float(jnp.abs(r).max()) < 1e-12

    # perturbation is pulled back to the freestream by Newton
    import numpy as np
    from mrhyde_tpu.solvers.nonlinear import newton_solve
    pert = 0.005 * np.random.RandomState(1).randn(p.n_dof)
    res = newton_solve(p.assembler, u + jnp.asarray(pert), tc, None,
                       tol=1e-12, abstol=1e-11, maxiter=10,
                       linear_method="direct")
    assert res.converged
    assert float(jnp.abs(res.u - u).max()) < 1e-8

"""Geometric multigrid preconditioner (solvers/multigrid.py) — the
MueLu AMG analog (reference: linearAlgebraInterface.cpp:358-430).

Checks: transfer-operator adjointness, mesh-independent convergence on
Poisson, and the node-block smoother on the complex-coefficient
Helmholtz system where point Jacobi degenerates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrhyde_tpu.assembly.assembler import TimeCoeffs
from mrhyde_tpu.problem import Problem
from mrhyde_tpu.solvers.krylov import gmres
from mrhyde_tpu.solvers.multigrid import StructuredMG, \
    build_mg_preconditioner


def _poisson(nx):
    return Problem({
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": nx, "NY": nx},
        "Functions": {"thermal source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
    })


def test_transfer_adjointness():
    p = _poisson(16)
    mg = StructuredMG(p.assembler)
    rng = np.random.RandomState(0)
    vc = jnp.asarray(rng.randn(mg.ndof[1]))
    vf = jnp.asarray(rng.randn(mg.ndof[0]))
    # <P vc, vf> == <vc, R vf>
    lhs = float(jnp.vdot(mg.prolong(0, vc), vf))
    rhs = float(jnp.vdot(vc, mg.restrict(0, vf)))
    assert np.isclose(lhs, rhs, rtol=1e-12)


@pytest.mark.slow
def test_mesh_independent_convergence():
    tc = None
    iters = []
    for nx in (16, 32, 64):
        p = _poisson(nx)
        tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
        J = p.assembler.jacobian(p.initial_state(), tc, None)
        b = jnp.asarray(np.random.RandomState(1).randn(p.n_dof))
        M = build_mg_preconditioner(p.assembler, J)
        x, info = gmres(J.apply, b, m=60, tol=1e-10, max_restarts=5,
                        precond=M)
        assert bool(info.converged)
        iters.append(int(info.iters))
    # MG quality: iteration count must not grow with the mesh
    assert iters[-1] <= iters[0] + 3
    assert iters[-1] <= 12


@pytest.mark.slow
def test_3d_hex_mg():
    p = Problem({
        "Mesh": {"dimension": 3, "element type": "hex",
                 "NX": 8, "NY": 8, "NZ": 8},
        "Functions": {"thermal source": "sin(pi*x)*sin(pi*y)*sin(pi*z)"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
    })
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    J = p.assembler.jacobian(p.initial_state(), tc, None)
    b = jnp.asarray(np.random.RandomState(2).randn(p.n_dof))
    M = build_mg_preconditioner(p.assembler, J)
    x, info = gmres(J.apply, b, m=40, tol=1e-10, max_restarts=5,
                    precond=M)
    assert bool(info.converged)
    assert int(info.iters) <= 12
    xd = jnp.linalg.solve(J.dense(), b)
    assert float(jnp.linalg.norm(x - xd)) < 1e-7 * (
        1 + float(jnp.linalg.norm(xd)))

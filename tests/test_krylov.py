"""Production linear algebra: residual-checked GMRES + preconditioners.

Covers the reference's Belos + Ifpack2 contract (reference:
src/interfaces/linearAlgebraInterface.cpp:358-500): the solver REPORTS
convergence (status-test analog), preconditioner variants are
selectable, and stiff decks converge on the iterative path where round 1
required `use direct solver: true`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrhyde_tpu.problem import Problem
from mrhyde_tpu.assembly.assembler import TimeCoeffs
from mrhyde_tpu.solvers.krylov import gmres
from mrhyde_tpu.solvers.precond import (build_preconditioner,
                                        chebyshev_precond,
                                        element_schwarz_precond)


def _poisson_problem(nx=24, use=None):
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": nx, "NY": nx},
        "Functions": {"thermal source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": dict({"solver": "steady-state",
                        "max nonlinear iters": 2}, **(use or {})),
        "Postprocess": {"compute errors": True,
                        "True solutions": {"e": "sin(2*pi*x)*sin(2*pi*y)"}},
    }
    return Problem(cfg)


def _state_jacobian(p):
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    u = jnp.zeros(p.n_dof)
    r = p.assembler.residual(u, tc, None)
    J = p.assembler.jacobian(u, tc, None)
    return J, -r


@pytest.mark.slow
def test_gmres_reports_true_residual_and_convergence():
    p = _poisson_problem()
    J, b = _state_jacobian(p)
    x, info = gmres(J.apply, b, m=30, tol=1e-10, max_restarts=20,
                    precond=build_preconditioner(J, "jacobi"))
    # the Givens residual estimate must match the actual residual
    actual = float(jnp.linalg.norm(b - J.apply(x)))
    assert bool(info.converged)
    assert actual <= 1e-10 * float(jnp.linalg.norm(b)) * 1.01
    assert np.isclose(float(info.resnorm), actual, rtol=1e-6, atol=1e-14)
    assert int(info.iters) > 0


def test_gmres_reports_nonconvergence_honestly():
    p = _poisson_problem()
    J, _ = _state_jacobian(p)
    # generic rhs (the manufactured load vector is an eigenvector of the
    # uniform-grid stiffness matrix and converges in ONE iteration);
    # 3 iterations cannot solve a 24x24 Poisson system for this b
    b = jnp.asarray(np.random.RandomState(0).randn(p.n_dof))
    x, info = gmres(J.apply, b, m=3, tol=1e-12, max_restarts=1,
                    precond=build_preconditioner(J, "jacobi"))
    assert not bool(info.converged)
    actual = float(jnp.linalg.norm(b - J.apply(x)))
    assert np.isclose(float(info.resnorm), actual, rtol=1e-6)


@pytest.mark.slow
def test_chebyshev_beats_jacobi_on_poisson():
    p = _poisson_problem(nx=32)
    J, _ = _state_jacobian(p)
    b = jnp.asarray(np.random.RandomState(1).randn(p.n_dof))
    _, info_j = gmres(J.apply, b, m=200, tol=1e-10, max_restarts=1,
                      precond=build_preconditioner(J, "jacobi"))
    _, info_c = gmres(J.apply, b, m=200, tol=1e-10, max_restarts=1,
                      precond=chebyshev_precond(J, degree=4))
    assert bool(info_c.converged)
    assert int(info_c.iters) < int(info_j.iters)


@pytest.mark.slow
def test_schwarz_solves_saddle_point_mixed_block():
    """Element-Schwarz handles the indefinite mixed-porous Jacobian
    (plain Jacobi stalls on the zero pressure-pressure block)."""
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad", "NX": 8, "NY": 8},
        "Physics": {"modules": "porous mixed",
                    "Dirichlet conditions": {"p": {"all boundaries": "0.0"}}},
        "Functions": {"source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Solver": {"solver": "steady-state", "initial type": "none",
                   "use direct solver": True},
        "Discretization": {"order": {"p": 0, "u": 1}, "quadrature": 2},
    }
    p = Problem(cfg)
    J, b = _state_jacobian(p)
    x, info = gmres(J.apply, b, m=60, tol=1e-10, max_restarts=10,
                    precond=element_schwarz_precond(J))
    assert bool(info.converged)
    xd = jnp.linalg.solve(J.dense(), b)
    assert float(jnp.linalg.norm(x - xd)) < 1e-6 * (1 + float(
        jnp.linalg.norm(xd)))


@pytest.mark.slow
def test_stiff_deck_converges_on_iterative_path():
    """Linear elasticity (vector HGRAD, stiff) solved end-to-end WITHOUT
    `use direct solver: true` — VERDICT round-1 item 4 'done' check."""
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 16, "NY": 16},
        "Physics": {"modules": "linearelasticity",
                    "Dirichlet conditions": {
                        "dx": {"all boundaries": "0.0"},
                        "dy": {"all boundaries": "0.0"}}},
        "Functions": {"source dx": "sin(pi*x)*sin(pi*y)",
                      "source dy": "cos(pi*x)*cos(pi*y)",
                      "lambda": "1.0", "mu": "1.0"},
        "Solver": {"solver": "steady-state", "max nonlinear iters": 3,
                   "preconditioner variant": "schwarz",
                   "linear TOL": 1e-11, "max linear iters": 2000},
        "Discretization": {"order": {"dx": 1, "dy": 1}, "quadrature": 2},
    }
    from mrhyde_tpu.solvers.nonlinear import newton_solve
    p = Problem(cfg)
    assert p._linear_method() == "gmres"   # iterative despite small n
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    res = newton_solve(p.assembler, p.initial_state(), tc, None,
                       tol=1e-9, maxiter=3, linear_method="gmres",
                       linear_tol=1e-11, linear_maxiter=2000,
                       precond_variant="schwarz")
    assert res.converged
    assert res.linear_converged   # reported, not assumed
    # parity with the direct path
    res_d = newton_solve(p.assembler, p.initial_state(), tc, None,
                         tol=1e-9, maxiter=3, linear_method="direct")
    assert float(jnp.linalg.norm(res.u - res_d.u)) < 1e-6 * (
        1 + float(jnp.linalg.norm(res_d.u)))

"""Linear solvers: matrix-free Krylov + small dense direct.

TPU-native replacement for the reference's Belos/MueLu/Ifpack2/Amesos2
stack (reference: src/interfaces/linearAlgebraInterface.cpp:358-500
linearSolver). Krylov methods operate on BlockJacobian.apply (gather +
batched einsum + segment-sum); preconditioning is Jacobi (diagonal),
matching the role Ifpack2 RELAXATION plays for the regression problems.
Small systems (projections, regression meshes) use a densified direct
solve — the analog of Amesos2 KLU2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.sparse.linalg as jsla

__all__ = ["solve_linear", "solve_dense", "solve_cg", "solve_gmres"]


def solve_dense(J, b):
    return jnp.linalg.solve(J.dense(), b)


def solve_cg(J, b, tol=1e-12, maxiter=1000):
    dinv = 1.0 / J.diag()
    x, _ = jsla.cg(J.apply, b, M=lambda v: dinv * v, tol=tol,
                   maxiter=maxiter)
    return x


def solve_gmres(J, b, tol=1e-12, maxiter=1000, restart=60):
    """Jacobi-preconditioned GMRES.

    Uses the fixed-shape hand-rolled GMRES (solvers/krylov.py) -- the
    jax.scipy implementation costs ~300 ms/iteration of bookkeeping
    overhead on the TPU. `restart` caps the Krylov dimension; `tol`
    is advisory (the cycle always runs `restart` steps).
    """
    from mrhyde_tpu.solvers.krylov import gmres_fixed
    dinv = 1.0 / J.diag()
    m = int(min(restart, maxiter))
    return gmres_fixed(J.apply, b, m=m, precond=lambda v: dinv * v)


def solve_linear(J, b, method="direct", tol=1e-12, maxiter=1000):
    """Solve J x = b. method in {direct, cg, gmres}."""
    if method == "direct":
        return solve_dense(J, b)
    if method == "cg":
        return solve_cg(J, b, tol=tol, maxiter=maxiter)
    if method == "gmres":
        return solve_gmres(J, b, tol=tol, maxiter=maxiter)
    raise ValueError(f"unknown linear solver {method!r}")

"""Newton solver with optional backtracking line search.

Mirrors the reference's SolverManager::nonlinearSolver
(src/managers/solverManager.cpp:1465-1714): residual norm check with
relative+absolute tolerances, J du = -R solve, backtracking halving on
residual increase. The outer iteration runs on host (iteration counts
are data-dependent); each (assemble J, R; solve) step is ONE jitted XLA
program cached on the assembler.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mrhyde_tpu.solvers.linear import solve_linear_info

__all__ = ["newton_solve", "NewtonResult"]


@dataclass
class NewtonResult:
    u: object
    iterations: int
    norm0: float
    norm: float
    converged: bool
    linear_converged: bool = True   # every inner solve met its tolerance
    linear_resnorm: float = 0.0     # last inner solve's final residual


def _newton_step_fn(assembler, linear_method, linear_tol, linear_maxiter,
                    precond_variant):
    """One fused (residual, Jacobian, linear solve) step, jit-cached."""
    cache = assembler.__dict__.setdefault("_newton_step_cache", {})
    key = (linear_method, linear_tol, linear_maxiter, precond_variant)
    if key not in cache:
        mg_variant = precond_variant in ("multigrid", "mg", "amg")
        if mg_variant:
            # build the (static) hierarchy once, outside the trace:
            # geometric MG on structured p1 grids, aggregation AMG on
            # everything else (the MueLu analog), element-Schwarz as
            # the last resort
            from mrhyde_tpu.solvers.multigrid import StructuredMG
            if "_mg_hierarchy" not in assembler.__dict__:
                hier = None
                if precond_variant != "amg":
                    try:
                        hier = StructuredMG(assembler)
                    except ValueError:
                        hier = None
                if hier is None:
                    from mrhyde_tpu.solvers.amg import AggregationAMG
                    try:
                        hier = AggregationAMG(assembler)
                    except ValueError:
                        hier = None
                assembler.__dict__["_mg_hierarchy"] = hier
            if assembler.__dict__["_mg_hierarchy"] is None:
                mg_variant = False
                precond_variant = "schwarz"

        def step(u, tc, pvec):
            r, J = assembler.res_and_jac(u, tc, pvec)
            pfn = (assembler.__dict__["_mg_hierarchy"].preconditioner(J)
                   if mg_variant else None)
            du, info = solve_linear_info(
                J, -r, method=linear_method, tol=linear_tol,
                maxiter=linear_maxiter, precond_variant=precond_variant,
                precond_fn=pfn)
            return du, jnp.linalg.norm(r), info
        cache[key] = jax.jit(step)
    return cache[key]


def newton_solve(assembler, u0, tc, pvec=None, *, tol=1e-6, abstol=1e-100,
                 maxiter=10, linear_method="direct", linear_tol=1e-12,
                 linear_maxiter=2000, backtracking=True, verbose=0,
                 precond_variant="jacobi"):
    u = u0
    step = _newton_step_fn(assembler, linear_method, linear_tol,
                           linear_maxiter, precond_variant)
    res_fn = getattr(assembler, "residual_jit", assembler.residual)
    norm0 = None
    norm = None
    it = 0
    lin_ok = True
    lin_res = 0.0
    while it < maxiter:
        du, norm_j, info = step(u, tc, pvec)
        norm = float(norm_j)
        if norm0 is None:
            norm0 = norm if norm > 0 else 1.0
        if verbose > 1:
            print(f"  Newton iter {it}: ||r|| = {norm:.6e} "
                  f"(linear: {int(info.iters)} its, "
                  f"res {float(info.resnorm):.2e})")
        if norm < max(tol * norm0, abstol):
            return NewtonResult(u, it, norm0, norm, True,
                                lin_ok, lin_res)
        lin_ok = lin_ok and bool(info.converged)
        lin_res = float(info.resnorm)
        if backtracking:
            alpha = 1.0
            for _cut in range(8):
                rn = res_fn(u + alpha * du, tc, pvec)
                if float(jnp.linalg.norm(rn)) <= norm or alpha < 1e-3:
                    break
                alpha *= 0.5
            u = u + alpha * du
        else:
            u = u + du
        it += 1
    rn = res_fn(u, tc, pvec)
    norm = float(jnp.linalg.norm(rn))
    converged = norm < max(tol * norm0, abstol)
    return NewtonResult(u, it, norm0, norm, converged, lin_ok, lin_res)

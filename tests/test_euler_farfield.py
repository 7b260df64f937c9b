"""Euler far-field / slip boundary residual (reference: euler.cpp
computeBoundaryTerm) — the characteristic flux splitting
F_hat.n = F(S).n + A-(S)(S_inf - S) consuming the unit-tested
eigendecomposition inside an actual solve (VERDICT round-1 item 10).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mrhyde_tpu.assembly.assembler import TimeCoeffs
from mrhyde_tpu.problem import Problem

# subsonic freestream: p = 1, rho = 1, u = (0.5, 0.1)
FREE = {"rho": 1.0, "rhoux": 0.5, "rhouy": 0.1,
        "rhoE": 1.0 / 0.4 + 0.5 * (0.5 ** 2 + 0.1 ** 2)}


def _cfg():
    return {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 8, "NY": 8},
        "Physics": {"modules": "Euler",
                    "max EV stabilization": True,
                    "Far-field conditions": {
                        v: {"all boundaries": str(val)}
                        for v, val in FREE.items()},
                    "Initial conditions": {
                        "scalar data": True,
                        **{v: val for v, val in FREE.items()}}},
        "Discretization": {"order": {v: 1 for v in FREE},
                           "quadrature": 2},
        "Solver": {"solver": "steady-state", "max nonlinear iters": 8,
                   "nonlinear TOL": 1e-10, "use direct solver": True,
                   "initial type": "interpolation"},
    }


def _freestream_vec(p, free=None):
    free = free or FREE
    u = jnp.zeros(p.n_dof)
    dm = p.assembler.disc.dofmap
    for i, v in enumerate(dm.vars):
        st = int(dm.var_start[i])
        name = v.name[:-4] if v.name.endswith("_hat") else v.name
        u = u.at[st:st + v.n_dof].set(free[name])
    return u


@pytest.mark.slow
def test_freestream_is_exact_steady_state():
    p = Problem(_cfg())
    u = _freestream_vec(p)
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    r = p.assembler.residual(u, tc, None)
    assert float(jnp.abs(r).max()) < 1e-12


@pytest.mark.slow
def test_newton_recovers_freestream_from_perturbation():
    """The A- characteristic correction must damp perturbations back to
    the freestream (wrong eigen-splitting signs diverge here)."""
    p = Problem(_cfg())
    u0 = _freestream_vec(p)
    rng = np.random.RandomState(0)
    pert = 0.01 * rng.randn(p.n_dof)
    from mrhyde_tpu.solvers.nonlinear import newton_solve
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    res = newton_solve(p.assembler, u0 + jnp.asarray(pert), tc, None,
                       tol=1e-12, abstol=1e-11, maxiter=10,
                       linear_method="direct")
    assert res.converged
    assert float(jnp.abs(res.u - u0).max()) < 1e-8


def test_slip_wall_preserves_tangential_freestream():
    """Slip walls top/bottom with x-aligned flow: the freestream
    (tangential to the walls) remains an exact steady state."""
    cfg = _cfg()
    free = dict(FREE)
    free["rhouy"] = 0.0
    free["rhoE"] = 1.0 / 0.4 + 0.5 * 0.5 ** 2
    cfg["Physics"]["Far-field conditions"] = {
        v: {"left": str(val), "right": str(val)}
        for v, val in free.items()}
    cfg["Physics"]["Slip conditions"] = {
        "rhoux": {"top": "0.0", "bottom": "0.0"}}
    cfg["Physics"]["Initial conditions"] = {
        "scalar data": True, **free}
    p = Problem(cfg)
    u = _freestream_vec(p, free)
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    r = p.assembler.residual(u, tc, None)
    assert float(jnp.abs(r).max()) < 1e-12

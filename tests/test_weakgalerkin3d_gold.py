"""Regression parity: porous/WeakGalerkin_3D.

Gold: regression/porous/WeakGalerkin_3D/mrhyde.gold — pint 0.109212,
pbndry face 4.93896, u 0.98109, t 0.98109 on a 10^3 hex mesh (HVOL +
3D HFACE traces + HDIV-DG weak gradient/flux). Solved with
unpreconditioned GMRES (the assembled WG operator is well-conditioned;
the reference used a direct solve).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mrhyde_tpu.assembly.assembler import TimeCoeffs
from mrhyde_tpu.problem import Problem
from mrhyde_tpu.solvers.krylov import gmres

SIDES = ("left", "right", "top", "bottom", "front", "back")


@pytest.mark.slow
def test_weak_galerkin_3d_matches_gold():
    cfg = {
        "Mesh": {"dimension": 3, "element type": "hex",
                 "NX": 10, "NY": 10, "NZ": 10},
        "Physics": {"eblock-0_0_0": {
            "modules": "porous weak Galerkin",
            "assemble face terms": True,
            "Dirichlet conditions": {
                "pbndry": {s: "0.0" for s in SIDES}}}},
        "Functions": {"source":
                      "12*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)*sin(2*pi*z)"},
        "Solver": {"solver": "steady-state", "initial type": "none"},
        "Discretization": {"eblock-0_0_0": {
            "order": {"pint": 0, "pbndry": 0, "u": 1, "t": 1},
            "quadrature": 2}},
        "Postprocess": {"compute errors": True, "True solutions": {
            "pint": "sin(2*pi*x)*sin(2*pi*y)*sin(2*pi*z)",
            "pbndry face": "sin(2*pi*x)*sin(2*pi*y)*sin(2*pi*z)",
            "u[x]": "2*pi*cos(2*pi*x)*sin(2*pi*y)*sin(2*pi*z)",
            "u[y]": "2*pi*sin(2*pi*x)*cos(2*pi*y)*sin(2*pi*z)",
            "u[z]": "2*pi*sin(2*pi*x)*sin(2*pi*y)*cos(2*pi*z)",
            "t[x]": "-2*pi*cos(2*pi*x)*sin(2*pi*y)*sin(2*pi*z)",
            "t[y]": "-2*pi*sin(2*pi*x)*cos(2*pi*y)*sin(2*pi*z)",
            "t[z]": "-2*pi*sin(2*pi*x)*sin(2*pi*y)*cos(2*pi*z)"}},
    }
    p = Problem(cfg)
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    u0 = p.initial_state()
    r = p.assembler.residual(u0, tc, None)
    J = p.assembler.jacobian(u0, tc, None)
    x, info = gmres(J.apply, -r, m=150, tol=1e-10, max_restarts=12)
    assert bool(info.converged)
    errs = p.error_calc.compute(u0 + x, 0.0)
    assert np.isclose(errs[("L2", "pint")], 0.109212, rtol=2e-5)
    assert np.isclose(errs[("L2-face", "pbndry")], 4.93896, rtol=2e-5)
    assert np.isclose(errs[("L2", "u")], 0.98109, rtol=2e-5)
    assert np.isclose(errs[("L2", "t")], 0.98109, rtol=2e-5)

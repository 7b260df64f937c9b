"""Regression parity: helmholtz/manufactured_solution.

Gold: /root/reference/regression/helmholtz/manufactured_solution/
mrhyde.gold — L2(ureal) = 0.000517267, L2(uimag) = 0.000222348 on a
100x100 quad mesh (complex variable coefficients c2 = (x^2-1) + 2xi,
Neumann impedance data on the right side). Solved end-to-end with the
multigrid-preconditioned GMRES path (the reference deck uses ILUT).
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem

CFG = {
    "Mesh": {"dimension": 2, "element type": "quad",
             "NX": 100, "NY": 100},
    "Physics": {"modules": "helmholtz",
                "Dirichlet conditions": {
                    "scalar data": True,
                    "ureal": {"left": 0.0, "top": 0.0, "bottom": 0.0},
                    "uimag": {"left": 0.0, "top": 0.0, "bottom": 0.0}},
                "Neumann conditions": {"ureal": {"right": "0.0"},
                                       "uimag": {"right": "0.0"}}},
    "Functions": {
        "source_r_side": "2.0*pi*cos(2*pi*x)*sin(2*pi*y)",
        "source_i_side": "2.0*pi*cos(2*pi*x)*sin(2*pi*y)",
        "scoeff": "8*pi*pi*(x*x-2*x-1)-1.0",
        "scoeffi": "8*pi*pi*(x*x+2*x-1)-1.0",
        "srcoeff": "2.0-2*x",
        "sicoeff": "-2.0-2*x",
        "source_r": "scoeff*sin(2*pi*x)*sin(2*pi*y) + "
                    "srcoeff*2*pi*cos(2*pi*x)*sin(2*pi*y)",
        "source_i": "scoeffi*sin(2*pi*x)*sin(2*pi*y) + "
                    "sicoeff*2*pi*cos(2*pi*x)*sin(2*pi*y)",
        "c2r_x": "x*x-1.0", "c2i_x": "2.0*x",
        "c2r_y": "x*x-1.0", "c2i_y": "2.0*x",
        "omega2r": "1.0", "omega2i": "0.0"},
    "Discretization": {"eblock-0_0": {
        "order": {"ureal": 1, "uimag": 1}, "quadrature": 2}},
    "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-8,
               "preconditioner variant": "multigrid",
               "linear TOL": 1e-11, "max linear iters": 1000,
               "restart": 100},
    "Postprocess": {"compute errors": True,
                    "True solutions": {
                        "ureal": "sin(2*pi*x)*sin(2*pi*y)",
                        "uimag": "sin(2*pi*x)*sin(2*pi*y)"}},
}


@pytest.mark.slow
def test_helmholtz_manufactured_matches_gold():
    res = Problem(CFG).run()
    assert np.isclose(res.errors[("L2", "ureal")], 0.000517267,
                      rtol=2e-5)
    assert np.isclose(res.errors[("L2", "uimag")], 0.000222348,
                      rtol=2e-5)

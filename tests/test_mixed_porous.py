"""Regression parity: porous/Mixed (HDIV velocity + HVOL pressure).

Gold: /root/reference/regression/porous/Mixed/mrhyde.gold
  L2(p) = 0.158697, L2(u) = 1.02259 on an 8x8 quad mesh.
"""

import numpy as np

from mrhyde_tpu.problem import Problem


def test_porous_mixed_matches_gold():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad", "NX": 8, "NY": 8},
        "Physics": {"eblock-0_0": {
            "modules": "porous mixed",
            "Dirichlet conditions": {"p": {"left": "1.0", "right": "1.0",
                                           "top": "1.0", "bottom": "1.0"}},
        }},
        "Functions": {"source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-7,
                   "max nonlinear iters": 2, "initial type": "none",
                   "use direct solver": True},
        "Discretization": {"eblock-0_0": {"order": {"p": 0, "u": 1},
                                          "quadrature": 2}},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "p": "1.0+sin(2*pi*x)*sin(2*pi*y)",
                            "u[x]": "-2*pi*cos(2*pi*x)*sin(2*pi*y)",
                            "u[y]": "-2*pi*sin(2*pi*x)*cos(2*pi*y)",
                            "div(u)": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"}},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "p")], 0.158697, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "u")], 1.02259, rtol=2e-5)
    # HDIV-seminorm of the error (div(u_h) is the L2 projection of the
    # source onto piecewise constants for lowest-order RT); value pinned
    # as a regression guard for the DIV error-norm path
    assert np.isclose(res.errors[("L2-div", "u")], 12.390539, rtol=1e-4)

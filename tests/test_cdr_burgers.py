"""Regression parity: cdr/2D_manufactured and burgers/1D_bump.

Gold values from /root/reference/regression/{cdr,burgers}/*/mrhyde.gold.
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


def test_cdr_2d_manufactured():
    # nonlinear steady CDR (reaction = 0.5*c*c); gold L2 = 0.00101714
    cfg = {
        "Mesh": {"dimension": 2, "shape": "quad", "NX": 40, "NY": 40},
        "Functions": {
            "source": "(8*(pi*pi)+0.5*sin(2*pi*x)*sin(2*pi*y))"
                      "*sin(2*pi*x)*sin(2*pi*y)"
                      " + 2.0*2*pi*cos(2*pi*x)*sin(2*pi*y)"
                      " + 1.0*2*pi*sin(2*pi*x)*cos(2*pi*y)",
            "xvel": "2.0", "yvel": "1.0",
            "reaction": "0.5*c*c", "SUPG tau": "0.0",
        },
        "Physics": {"modules": "cdr",
                    "Dirichlet conditions": {"c": {"all boundaries": "0.0"}},
                    "Initial conditions": {"c": "0.0"}},
        "Discretization": {"order": {"c": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-7,
                   "max nonlinear iters": 4},
        "Postprocess": {"compute errors": True,
                        "True solutions": {"c": "sin(2*pi*x)*sin(2*pi*y)"}},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "c")], 0.00101714, rtol=2e-5)


@pytest.fixture(scope="module")
def burgers_result():
    cfg = {
        "Mesh": {"dimension": 1, "element type": "interval", "NX": 100},
        "Physics": {"modules": "Burgers",
                    "Dirichlet conditions": {"scalar data": True,
                                             "u": {"left": 0.0,
                                                   "right": 0.0}},
                    "Initial conditions": {"u": "exp(bubble)"}},
        "Discretization": {"order": {"u": 1}, "quadrature": 2},
        "Functions": {"Burgers source": "0.0", "xvel": "100.0",
                      "yvel": "0.0", "diffusion": "1.0e-3",
                      "bubble": "-100.0*(x-0.2)*(x-0.2)"},
        "Solver": {"solver": "transient",
                   "transient Butcher tableau": "BWE",
                   "nonlinear TOL": 1e-7, "max nonlinear iters": 10,
                   "final time": 0.004, "delta t": 1.0e-3,
                   "allow backtracking": True,
                   "use direct solver": True},
        "Postprocess": {"compute errors": True,
                        "True solutions": {"u": "0.0"}},
    }
    return Problem(cfg).run()


@pytest.mark.slow
def test_burgers_initial_projection(burgers_result):
    # t=0 value checks the L2 projection of exp(-100(x-0.2)^2)
    hist = dict((round(t, 10), e[("L2", "u")])
                for t, e in burgers_result.error_history)
    assert np.isclose(hist[0.0], 0.354012, rtol=2e-5)


def test_burgers_evolution(burgers_result):
    # burgers/1D_Nonlinear_Backtracking gold (xvel=100 advection,
    # nonlinear Newton with backtracking)
    hist = dict((round(t, 10), e[("L2", "u")])
                for t, e in burgers_result.error_history)
    assert np.isclose(hist[0.001], 0.329584, rtol=2e-5)
    assert np.isclose(hist[0.002], 0.313885, rtol=2e-5)
    assert np.isclose(hist[0.004], 0.291375, rtol=2e-5)

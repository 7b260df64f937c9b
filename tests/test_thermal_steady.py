"""Regression parity: thermal/2D_verification.

Gold values from /root/reference/regression/thermal/2D_verification/
mrhyde.gold (printed to 6 significant digits):
  L2(e)       = 0.00102776
  L2(grad e)  = 0.201394
  L2-face(e)  = 0.0017603
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem

CFG = {
    "Mesh": {"dimension": 2, "element type": "quad",
             "xmin": 0.0, "xmax": 1.0, "ymin": 0.0, "ymax": 1.0,
             "NX": 40, "NY": 40},
    "Functions": {
        "thermal source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)",
    },
    "Physics": {
        "modules": "thermal",
        "Dirichlet conditions": {"scalar data": True,
                                 "e": {"all boundaries": 0.0}},
        "Initial conditions": {"scalar data": True, "e": 0.0},
    },
    "Discretization": {"order": {"e": 1}, "quadrature": 2},
    "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-7,
               "max nonlinear iters": 2, "use strong DBCs": True},
    "Analysis": {"analysis type": "forward"},
    "Postprocess": {
        "compute errors": True,
        "True solutions": {
            "e": "sin(2*pi*x)*sin(2*pi*y)",
            "e face": "sin(2*pi*x)*sin(2*pi*y)",
            "grad(e)[x]": "2*pi*cos(2*pi*x)*sin(2*pi*y)",
            "grad(e)[y]": "2*pi*sin(2*pi*x)*cos(2*pi*y)",
        },
    },
}


@pytest.fixture(scope="module")
def result():
    return Problem(CFG).run()


@pytest.mark.slow
def test_l2_error_matches_reference(result):
    assert np.isclose(result.errors[("L2", "e")], 0.00102776, rtol=1e-4)


def test_grad_error_matches_reference(result):
    assert np.isclose(result.errors[("L2-grad", "e")], 0.201394, rtol=1e-4)


def test_face_error_matches_reference(result):
    assert np.isclose(result.errors[("L2-face", "e")], 0.0017603, rtol=1e-4)

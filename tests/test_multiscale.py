"""Regression parity: thermal/2D_verification_multiscale (subgrid DtN).

Gold: /root/reference/regression/thermal/2D_verification_multiscale/
mrhyde.gold:
  macro L2-face(e)       = 0.198706
  Subgrid 0: L2(e)       = 0.042848
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem

CFG = {
    "Mesh": {"dimension": 2, "element type": "quad", "NX": 4, "NY": 4},
    "Functions": {"thermal source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
    "Physics": {"Extra variables": {"e": "HGRAD"},
                "assemble face terms": True,
                "Dirichlet conditions": {"e": {"all boundaries": "0.0"}}},
    "Discretization": {"order": {"Extra variables": {"e": 1}},
                       "quadrature": 2},
    "Solver": {"solver": "steady-state"},
    "Postprocess": {"compute errors": True,
                    "True solutions": {"e face": "sin(2*pi*x)*sin(2*pi*y)"}},
    "Subgrid": {
        "subgrid model": "DtN2",
        "Mesh": {"element type": "quad", "refinements": 2, "dimension": 2},
        "Physics": {"modules": "thermal",
                    "Neumann conditions": {"e": {"top": "0.0",
                                                 "bottom": "0.0"}}},
        "Solver": {"solver": "steady-state", "use direct solver": True},
        "Functions": {"thermal source":
                      "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Postprocess": {"True solutions": {"e": "sin(2*pi*x)*sin(2*pi*y)"}},
    },
}


@pytest.fixture(scope="module")
def result():
    return Problem(CFG).run()


@pytest.mark.slow
def test_macro_face_error(result):
    assert np.isclose(result.errors[("L2-face", "e")], 0.198706, rtol=1e-3)


def test_subgrid_error(result):
    assert np.isclose(result.errors[("Subgrid-L2", "e")], 0.042848,
                      rtol=1e-3)

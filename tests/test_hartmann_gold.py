"""Regression parity: hartmann/analytical_solve.

The reference deck (regression/hartmann/analytical_solve/input.yaml)
has no mrhyde.gold — the oracle is the ANALYTIC Hartmann MHD channel
solution u = uhat (1 - cosh(Ha x)/cosh(Ha)), b = -x/Ha + uhat
sinh(Ha x)/cosh(Ha), exercised through the solution-dependent Neumann
data on b ('-resistivity*b', hartmann.cpp boundaryResidual). Errors are
pinned at NX=500 and checked for h^2 convergence.
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


def _cfg(nx):
    return {
        "Mesh": {"dimension": 1, "element type": "interval",
                 "xmin": -1.0, "xmax": 1.0, "NX": nx},
        "Physics": {"modules": "hartmann",
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "u": {"left": 0.0, "right": 0.0}},
                    "Neumann conditions": {
                        "b": {"left": "-resistivity*b",
                              "right": "-resistivity*b"}}},
        "Functions": {
            "uhat": "(resistivity+1)/(hartmannNum*(hartmannNum+"
                    "resistivity*sinh_Ha/cosh_Ha))",
            "cosh_Ha": "cosh(hartmannNum)",
            "sinh_Ha": "sinh(hartmannNum)",
            "cosh_xHa": "cosh(x*hartmannNum)",
            "sinh_xHa": "sinh(x*hartmannNum)"},
        "Parameters": {
            "resistivity": {"type": "scalar", "value": 1.0,
                            "usage": "inactive"},
            "hartmannNum": {"type": "scalar", "value": 1.0,
                            "usage": "inactive"}},
        "Discretization": {"order": {"u": 1, "b": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-10,
                   "max nonlinear iters": 2, "use direct solver": True},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "u": "uhat*(1-cosh_xHa/cosh_Ha)",
                            "b": "-x/hartmannNum+uhat*sinh_xHa/cosh_Ha"}},
    }


@pytest.mark.slow
def test_hartmann_analytical():
    e250 = Problem(_cfg(250)).run().errors
    e500 = Problem(_cfg(500)).run().errors
    assert np.isclose(e500[("L2", "u")], 1.126126e-06, rtol=1e-4)
    assert np.isclose(e500[("L2", "b")], 1.062206e-06, rtol=1e-4)
    for v in ("u", "b"):
        ratio = e250[("L2", v)] / e500[("L2", v)]
        assert 3.8 < ratio < 4.2     # h^2

"""Regression parity: maxwell/NonzeroIC (3D HCURL E + HDIV B).

Gold: /root/reference/regression/maxwell/NonzeroIC/mrhyde.gold:
  L2(E) = 0.0692758 (t=0, projection), 0.0743729 (t=0.01)
  L2(B) = 0.0976523 (t=0), 0.101339 (t=0.01)
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem

SINES = "sin(pi*x)*sin(pi*y)*sin(pi*z)"


@pytest.fixture(scope="module")
def result():
    cfg = {
        "Mesh": {"dimension": 3, "shape": "hex", "NX": 8, "NY": 8,
                 "NZ": 8},
        "Physics": {"modules": "maxwell",
                    "Initial conditions": {
                        f"{v}[{c}]": SINES
                        for v in ("E", "B") for c in "xyz"}},
        "Functions": {"current x": "0.0", "permittivity": "1.0",
                      "permeability": "1.0"},
        "Discretization": {"eblock-0_0_0": {"order": {"E": 1, "B": 1},
                                            "quadrature": 2}},
        "Solver": {"solver": "transient", "transient BDF order": 1,
                   "transient Butcher tableau": "DIRK-1,2",
                   "nonlinear TOL": 1e-7, "max nonlinear iters": 1,
                   "final time": 0.01, "number of steps": 1,
                   "initial type": "L2-projection",
                   "allow backtracking": False,
                   "use direct solver": True},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            f"{v}[{c}]": SINES
                            for v in ("E", "B") for c in "xyz"}},
    }
    return Problem(cfg).run()


def test_initial_projection_matches_gold(result):
    errs0 = dict(result.error_history)[0.0]
    assert np.isclose(errs0[("L2", "E")], 0.0692758, rtol=2e-5)
    assert np.isclose(errs0[("L2", "B")], 0.0976523, rtol=2e-5)


def test_step_matches_gold(result):
    errs1 = result.error_history[-1][1]
    assert np.isclose(errs1[("L2", "E")], 0.0743729, rtol=2e-5)
    assert np.isclose(errs1[("L2", "B")], 0.101339, rtol=2e-5)

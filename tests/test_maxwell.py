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


@pytest.mark.slow
def test_initial_projection_matches_gold(result):
    errs0 = dict(result.error_history)[0.0]
    assert np.isclose(errs0[("L2", "E")], 0.0692758, rtol=2e-5)
    assert np.isclose(errs0[("L2", "B")], 0.0976523, rtol=2e-5)


def test_step_matches_gold(result):
    errs1 = result.error_history[-1][1]
    assert np.isclose(errs1[("L2", "E")], 0.0743729, rtol=2e-5)
    assert np.isclose(errs1[("L2", "B")], 0.101339, rtol=2e-5)


@pytest.mark.slow
def test_maxwell_planewave_gold():
    """maxwell/PlaneWave: 3D HCURL/HCURL-HDIV E-B on a doubly-periodic
    2x2x100 hex mesh driven by a gated current sheet with PML-style
    cubic conductivity ramps; DIRK-1,2 in time. Runs straight from the
    reference YAML includes (the permittivity expression's unbalanced
    parenthesis is auto-closed like the reference interpreter)."""
    import yaml
    from mrhyde_tpu.problem import Problem
    d = "/root/reference/regression/maxwell/PlaneWave"
    mc = yaml.safe_load(open(f"{d}/input.yaml"))["ANONYMOUS"]
    mesh = yaml.safe_load(open(f"{d}/input_mesh.yaml"))["ANONYMOUS"][
        "Mesh"]
    funcs = yaml.safe_load(open(f"{d}/input_functions.yaml"))[
        "ANONYMOUS"]["Functions"]
    cfg = {"Mesh": mesh, "Physics": mc["Physics"],
           "Discretization": mc["Discretization"],
           "Solver": mc["Solver"], "Postprocess": mc["Postprocess"],
           "Functions": funcs}
    res = Problem(cfg).run()
    hist = {round(t * 1e15, 6): e for t, e in res.error_history}
    gold = [(1.0, 2.40271e-13, 9.65806e-23),
            (3.0, 2.07228e-12, 1.62303e-21),
            (10.0, 1.60808e-11, None)]
    for t, ge, gb in gold:
        errs = hist[t]
        assert np.isclose(errs[("L2", "E")], ge, rtol=1e-4)
        if gb is not None:
            assert np.isclose(errs[("L2", "B")], gb, rtol=1e-4)

"""Regression parity: phasefield/2d-3phi (multi-species Allen-Cahn).

Gold: /root/reference/regression/phasefield/2d-3phi/mrhyde.gold — three
disk-initialized phases on a 100x100 mesh, one BWE step to t=0.5;
thermal_diff/L/A enter as parameters (L active).

The reference's solution vectors are push_back'ed per qp without
clearing (msphasefield.cpp:207-255), so with the deck's 'workset size:
1' each element's fields are frozen at its first Intrepid2 quadrature
point; 'legacy first-qp sampling' reproduces this for parity (t=0.5
values match to print precision).
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


def _cfg(legacy):
    return {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "xmin": 0.0, "xmax": 100.0, "ymin": 0.0, "ymax": 100.0,
                 "NX": 100, "NY": 100},
        "Physics": {"number_phases": 3, "modules": "msphasefield",
                    "legacy first-qp sampling": legacy,
                    "Initial conditions": {
                        "phi1": "1.0*(rone<12.5)",
                        "phi2": "1.0*(rtwo<12.5)",
                        "phi3": "1.0*(rthree<12.5)"}},
        "Functions": {
            "rone": "((x-37.5)*(x-37.5) + (y-50.0)*(y-50.0))^(0.5)",
            "rtwo": "((x-61.5)*(x-61.5) + (y-50.0)*(y-50.0))^(0.5)",
            "rthree": "((x-50.0)*(x-50.0) + (y-75.0)*(y-75.0))^(0.5)"},
        "Parameters": {
            "thermal_diff": {"type": "scalar", "value": 2.0,
                             "usage": "inactive"},
            "L": {"type": "scalar", "value": 2.0, "usage": "active"},
            "A": {"type": "scalar", "value": 0.2, "usage": "inactive"}},
        "Discretization": {"order": {"phi1": 1, "phi2": 1, "phi3": 1},
                           "quadrature": 2},
        "Solver": {"solver": "transient", "initial type": "interpolation",
                   "nonlinear TOL": 1e-7, "max nonlinear iters": 10,
                   "final time": 0.5, "delta t": 0.5},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "phi1": "sin(2*pi*x)*sin(2*pi*y)",
                            "phi2": "sin(2*pi*x)*sin(2*pi*y)",
                            "phi3": "sin(2*pi*x)*sin(2*pi*y)"}},
    }


@pytest.mark.slow
def test_phasefield_2d_3phi_matches_gold():
    res = Problem(_cfg(True)).run()
    t0 = dict(res.error_history[0][1])
    t5 = dict(res.error_history[-1][1])
    assert np.isclose(t0[("L2", "phi1")], 96.6679, rtol=2e-5)
    assert np.isclose(t0[("L2", "phi2")], 96.6679, rtol=2e-5)
    assert np.isclose(t0[("L2", "phi3")], 96.6932, rtol=2e-5)
    assert np.isclose(t5[("L2", "phi1")], 96.7726, rtol=2e-5)
    assert np.isclose(t5[("L2", "phi2")], 96.7815, rtol=2e-5)
    assert np.isclose(t5[("L2", "phi3")], 96.9442, rtol=2e-5)


@pytest.mark.slow
def test_phasefield_correct_weak_form_evolves():
    """Default (non-legacy) path: the well potential keeps the phases
    bounded and the step changes the solution."""
    cfg = _cfg(False)
    cfg["Mesh"]["NX"] = cfg["Mesh"]["NY"] = 20
    res = Problem(cfg).run()
    t0 = dict(res.error_history[0][1])
    t5 = dict(res.error_history[-1][1])
    for v in ("phi1", "phi2", "phi3"):
        assert np.isfinite(t5[("L2", v)])
        assert t5[("L2", v)] != t0[("L2", v)]

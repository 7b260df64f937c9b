"""Regression parity: regression/ODE/* — pins every time integrator.

Gold final-time L2 errors from /root/reference/regression/ODE/<name>/
mrhyde.gold (q' = -q, q(0)=1, 10 steps to t=1, vs exp(-t)).
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem

GOLD = {
    # name: (solver overrides, err@t=0.9, err@t=1.0)
    "BWE": ({"transient Butcher tableau": "BWE"},
            0.017528, 0.0176638),
    "FWE": ({"transient Butcher tableau": "FWE"},
            0.0191492, 0.019201),
    "CrankNicolson": ({"transient Butcher tableau": "CN"},
                      0.000305271, 0.000306899),
    "DIRK-1,2": ({"transient Butcher tableau": "DIRK-1,2"},
                 0.000305271, 0.000306899),
    "DIRK-2,2": ({"transient Butcher tableau": "DIRK-2,2"},
                 7.62533e-05, 7.66623e-05),
    "DIRK-2,3": ({"transient Butcher tableau": "DIRK-2,3"},
                 2.96315e-05, 2.97907e-05),
    "DIRK-3,3": ({"transient Butcher tableau": "DIRK-3,3"},
                 8.95148e-06, 8.99958e-06),
    "SSPRK-3,3": ({"transient Butcher tableau": "SSPRK-3,3"},
                  1.65181e-05, 1.66068e-05),
    "RK-4,4": ({"transient Butcher tableau": "RK-4,4"},
               3.31459e-07, 3.33241e-07),
    "BDF2": ({"transient Butcher tableau": "BWE",
              "transient BDF order": 2,
              "transient startup Butcher tableau": "DIRK-1,2",
              "transient startup BDF order": 1,
              "transient startup steps": 2},
             0.00103101, 0.00106624),
    "BDF3": ({"transient Butcher tableau": "BWE",
              "transient BDF order": 3,
              "transient startup Butcher tableau": "RK-4,4",
              "transient startup BDF order": 1,
              "transient startup steps": 5},
             4.01666e-05, 4.69999e-05),
    "BDF4": ({"transient Butcher tableau": "BWE",
              "transient BDF order": 4,
              "transient startup Butcher tableau": "RK-4,4",
              "transient startup BDF order": 1,
              "transient startup steps": 5},
             3.22587e-06, 3.77563e-06),
    "custom": ({"transient Butcher tableau": "custom",
                "transient Butcher A":
                    "0.0, 0.0, 0.0, 0.0; 0.5, 0.0, 0.0, 0.0; "
                    "0.0, 0.5, 0.0, 0.0; 0.0, 0.0, 1.0, 0.0",
                "transient Butcher b":
                    "0.1666666667, 0.3333333333, 0.3333333333, "
                    "0.1666666667",
                "transient Butcher c": "0.0, 0.5, 0.5, 1.0"},
               3.31459e-07, 3.33241e-07),
}


def make_cfg(solver_overrides):
    solver = {"solver": "transient", "transient BDF order": 1,
              "workset size": 1, "nonlinear TOL": 1e-7,
              "max nonlinear iters": 2, "final time": 1.0,
              "number of steps": 10, "use direct solver": True}
    solver.update(solver_overrides)
    return {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 2, "NY": 2},
        "Functions": {"ODE source": "-1.0*q"},
        "Physics": {"modules": "ODE",
                    "Initial conditions": {"q": "1.0"}},
        "Discretization": {"order": {"q": 1}, "quadrature": 1},
        "Solver": solver,
        "Analysis": {"analysis type": "forward"},
        "Postprocess": {"compute errors": True,
                        "True solutions": {"q": "1.0*exp(-1.0*t)"}},
    }


@pytest.mark.parametrize("name", sorted(GOLD))
def test_ode_integrator_matches_gold(name):
    overrides, gold09, gold10 = GOLD[name]
    res = Problem(make_cfg(overrides)).run()
    hist = dict((round(t, 10), errs[("L2", "q")])
                for t, errs in res.error_history)
    assert np.isclose(hist[0.9], gold09, rtol=2e-5), (hist[0.9], gold09)
    assert np.isclose(hist[1.0], gold10, rtol=2e-5), (hist[1.0], gold10)


def test_rk44_fully_explicit_matches_gold():
    cfg = make_cfg({"transient Butcher tableau": "RK-4,4",
                    "fully explicit": True, "lump mass": True})
    res = Problem(cfg).run()
    hist = dict((round(t, 10), errs[("L2", "q")])
                for t, errs in res.error_history)
    assert np.isclose(hist[0.9], 3.31459e-07, rtol=2e-5)
    assert np.isclose(hist[1.0], 3.33241e-07, rtol=2e-5)

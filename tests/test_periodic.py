"""Periodic BCs: cdr/periodic regression parity (advected bubble on a
periodic strip; gold values from the reference's mrhyde.gold)."""

import numpy as np

from mrhyde_tpu.problem import Problem

CFG = {
    "Mesh": {"dimension": 2, "element type": "quad", "NX": 40, "NY": 40,
             "Periodic BCs": {"Count": 1,
                              "Periodic Condition 1":
                                  "y-all 1e-8: left;right"}},
    "Functions": {"source": "0.0", "diffusion": "0.5", "xvel": "10.0",
                  "yvel": "0.0", "reaction": "0.0", "SUPG tau": "0.0",
                  "bubble": "-25.0*(x-0.7)*(x-0.7) - 25.0*(y-0.5)*(y-0.5)"},
    "Physics": {"modules": "cdr", "Initial conditions": {"c": "exp(bubble)"}},
    "Discretization": {"order": {"c": 1}, "quadrature": 2},
    "Solver": {"solver": "transient", "nonlinear TOL": 1e-7,
               "max nonlinear iters": 10, "final time": 1.0,
               "delta t": 0.1},
    "Postprocess": {"compute errors": True, "True solutions": {"c": "0.0"}},
}


def test_cdr_periodic_matches_gold():
    res = Problem(CFG).run()
    hist = {round(t, 10): e[("L2", "c")] for t, e in res.error_history}
    assert np.isclose(hist[0.0], 0.250474, rtol=2e-5)
    assert np.isclose(hist[0.1], 0.131765, rtol=2e-5)
    assert np.isclose(hist[1.0], 0.123484, rtol=2e-5)

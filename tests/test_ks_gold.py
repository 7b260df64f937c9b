"""Regression parity: ks/1D_wave (Kuramoto-Sivashinsky).

Gold: /root/reference/regression/ks/1D_wave/mrhyde.gold — the full
|u| and |w| trajectory over 20 BWE steps on a periodic 1D mesh
(True solutions are 0, so the printed "errors" pin the evolution).
"""

from mrhyde_tpu.problem import Problem
from tests.gold_utils import assert_matches_gold

GOLD = "/root/reference/regression/ks/1D_wave/mrhyde.gold"


def test_ks_1d_wave_matches_gold():
    cfg = {
        "Mesh": {"dimension": 1, "element type": "interval",
                 "xmin": 0.0, "xmax": 1.0, "NX": 10,
                 "Periodic BCs": {"Count": 1,
                                  "Periodic Condition 1":
                                  "x-all 1e-8: left;right"}},
        "Physics": {"modules": "Kuramoto-Sivashinsky",
                    "Initial conditions": {"u": "sin(2*pi*x)"}},
        "Discretization": {"order": {"u": 1, "w": 1}, "quadrature": 2},
        "Solver": {"solver": "transient",
                   "transient Butcher tableau": "BWE",
                   "nonlinear TOL": 1e-7, "max nonlinear iters": 10,
                   "final time": 2.0e-2, "delta t": 1.0e-3,
                   "use direct solver": True},
        "Postprocess": {"compute errors": True,
                        "True solutions": {"u": "0.0", "w": "0.0"}},
    }
    res = Problem(cfg).run()
    n = assert_matches_gold(res, GOLD)
    assert n >= 40          # 21 u lines + 21 w lines (minus t=0 w)

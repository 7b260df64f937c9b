"""Regression parity: vdns/channel (low-Mach variable-density NS).

Gold: /root/reference/regression/vdns/channel/mrhyde.gold —
L2(ux)=0.0019421, L2(pr)=0.0128887, L2(T)=0, L2(uy)=8.18291e-05 on a
50x10 channel with PSPG, traction (Neumann) in/outflow data, and
p0/dp0dt entering as inactive parameters.
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


@pytest.mark.slow
def test_vdns_channel_matches_gold():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "xmin": 0.0, "xmax": 5.0, "ymin": 0.0, "ymax": 1.0,
                 "NX": 50, "NY": 10},
        "Physics": {"modules": "VDNS", "usePSPG": True,
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "ux": {"bottom": 0.0, "top": 0.0},
                        "uy": {"bottom": 0.0, "top": 0.0},
                        "T": {"bottom": 1.0, "top": 1.0},
                        "pr": {"left": 0.0}},
                    "Neumann conditions": {
                        "ux": {"left": "0.0", "right": "0.0"},
                        "uy": {"left": "-.5*(1.-2.*y)",
                               "right": ".5*(1.-2.*y)"}},
                    "Initial conditions": {
                        "scalar data": False,
                        "ux": "0.0", "uy": "0.0", "pr": "0.0",
                        "T": "1.0"}},
        "Functions": {"source ux": "1.0", "rho": "1.0", "mu": "1.0",
                      "cp": "1.0", "lambda": "1.0"},
        "Parameters": {
            "p0": {"type": "scalar", "value": 1.0, "usage": "inactive"},
            "dp0dt": {"type": "scalar", "value": 0.0,
                      "usage": "inactive"}},
        "Discretization": {"order": {"ux": 1, "uy": 1, "pr": 1, "T": 1},
                           "quadrature": 2},
        "Solver": {"solver": "steady-state", "use direct solver": True},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "ux": "0.5*y*(1.0-y)", "uy": "0.0",
                            "pr": "0.0", "T": "1.0"}},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "ux")], 0.0019421, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "pr")], 0.0128887, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "uy")], 8.18291e-05, rtol=2e-5)
    assert res.errors[("L2", "T")] < 1e-14

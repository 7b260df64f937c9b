"""Regression parity: porous/WeakGalerkin_AC, WeakGalerkin_highorder,
Mixed_hybrid_highorder (VERDICT round-1 missing item 3).

These exercise the Arbogast-Correa AC_QUAD broken velocity space
(in-tree Intrepid2_HDIV_AC_QUAD_I1_FEMDef.hpp), broken RT[1] (Intrepid2
HDIV_QUAD_In degree 2) velocities, HGRAD-DG broken pressures ('Active
variables' overrides), and order-1 HFACE traces, against the reference
mrhyde.gold values.
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem

_SIDES4 = {"left": "0.0", "right": "0.0", "top": "0.0", "bottom": "0.0"}


def _wg_cfg(orders, quadrature, active=None, useAC=False):
    phys = {"modules": "porous weak Galerkin",
            "assemble face terms": True,
            "Dirichlet conditions": {"pbndry": dict(_SIDES4)}}
    if active:
        phys["Active variables"] = active
    if useAC:
        phys["useAC"] = True
    return {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 10, "NY": 10},
        "Physics": {"eblock-0_0": phys},
        "Functions": {"source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Solver": {"solver": "steady-state", "initial type": "none",
                   "use direct solver": True,
                   "use preconditioner": False},
        "Discretization": {"eblock-0_0": {"order": orders,
                                          "quadrature": quadrature}},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "pint": "sin(2*pi*x)*sin(2*pi*y)",
                            "pbndry face": "sin(2*pi*x)*sin(2*pi*y)",
                            "u[x]": "2*pi*cos(2*pi*x)*sin(2*pi*y)",
                            "u[y]": "2*pi*sin(2*pi*x)*cos(2*pi*y)",
                            "t[x]": "-2*pi*cos(2*pi*x)*sin(2*pi*y)",
                            "t[y]": "-2*pi*sin(2*pi*x)*cos(2*pi*y)"}},
    }


@pytest.mark.slow
def test_weak_galerkin_ac_matches_gold():
    cfg = _wg_cfg({"pint": 0, "pbndry": 0, "u": 1, "t": 1}, 2,
                  useAC=True)
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "pint")], 0.127469, rtol=2e-5)
    assert np.isclose(res.errors[("L2-face", "pbndry")], 1.2962,
                      rtol=2e-5)


@pytest.mark.slow
def test_weak_galerkin_highorder_matches_gold():
    cfg = _wg_cfg({"pint": 1, "pbndry": 1, "u": 2, "t": 2}, 4,
                  active={"pint": "HGRAD-DG", "u": "HDIV-DG",
                          "t": "HDIV-DG", "pbndry": "HFACE"})
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "pint")], 0.0103523, rtol=2e-5)
    assert np.isclose(res.errors[("L2-face", "pbndry")], 0.103523,
                      rtol=2e-5)
    assert np.isclose(res.errors[("L2", "u")], 0.065258, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "t")], 0.065258, rtol=2e-5)


@pytest.mark.slow
def test_mixed_hybrid_highorder_matches_gold():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 8, "NY": 8},
        "Physics": {"eblock-0_0": {
            "modules": "porous mixed hybridized",
            "Active variables": {"p": "HGRAD-DG", "u": "HDIV-DG",
                                 "lambda": "HFACE"},
            "assemble face terms": True,
            "Dirichlet conditions": {"lambda": dict(_SIDES4)}}},
        "Functions": {"source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-7,
                   "max nonlinear iters": 2, "initial type": "none",
                   "use direct solver": True,
                   "use preconditioner": False},
        "Discretization": {"eblock-0_0": {
            "order": {"p": 1, "u": 2, "lambda": 1}, "quadrature": 4}},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "lambda face": "sin(2*pi*x)*sin(2*pi*y)",
                            "p": "sin(2*pi*x)*sin(2*pi*y)",
                            "u[x]": "-2*pi*cos(2*pi*x)*sin(2*pi*y)",
                            "u[y]": "-2*pi*sin(2*pi*x)*cos(2*pi*y)"}},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "p")], 0.0161306, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "u")], 0.101867, rtol=2e-5)
    assert np.isclose(res.errors[("L2-face", "lambda")], 0.129045,
                      rtol=2e-5)

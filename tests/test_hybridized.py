"""Hybridized mixed porous flow: matches the conforming mixed golds
(porous/Mixed: L2(p)=0.158697, L2(u)=1.02259) since hybridization is an
algebraic reformulation of the same method."""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


@pytest.mark.slow
def test_porous_mixed_hybridized_matches_mixed_gold():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad", "NX": 8, "NY": 8},
        "Physics": {"modules": "porous mixed hybridized",
                    "Dirichlet conditions": {
                        "lambda": {"left": "1.0", "right": "1.0",
                                   "top": "1.0", "bottom": "1.0"}}},
        "Functions": {"source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-7,
                   "max nonlinear iters": 2, "initial type": "none",
                   "use direct solver": True},
        "Discretization": {"order": {"p": 0, "u": 1, "lambda": 0},
                           "quadrature": 2},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "p": "1.0+sin(2*pi*x)*sin(2*pi*y)",
                            "u[x]": "-2*pi*cos(2*pi*x)*sin(2*pi*y)",
                            "u[y]": "-2*pi*sin(2*pi*x)*cos(2*pi*y)"}},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "p")], 0.158697, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "u")], 1.02259, rtol=2e-5)


@pytest.mark.slow
def test_porous_weak_galerkin_matches_gold():
    """Regression parity: porous/WeakGalerkin_2D.

    Gold: regression/porous/WeakGalerkin_2D/mrhyde.gold — pint
    0.127469, pbndry face 1.2962, u 0.814028, t 0.814028 at 10x10."""
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 10, "NY": 10},
        "Physics": {"eblock-0_0": {
            "modules": "porous weak Galerkin",
            "assemble face terms": True,
            "Dirichlet conditions": {
                "pbndry": {"left": "0.0", "right": "0.0",
                           "top": "0.0", "bottom": "0.0"}}}},
        "Functions": {"source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Solver": {"solver": "steady-state", "initial type": "none",
                   "use direct solver": True,
                   "use preconditioner": False},
        "Discretization": {"eblock-0_0": {
            "order": {"pint": 0, "pbndry": 0, "u": 1, "t": 1},
            "quadrature": 2}},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "pint": "sin(2*pi*x)*sin(2*pi*y)",
                            "pbndry face": "sin(2*pi*x)*sin(2*pi*y)",
                            "u[x]": "2*pi*cos(2*pi*x)*sin(2*pi*y)",
                            "u[y]": "2*pi*sin(2*pi*x)*cos(2*pi*y)",
                            "t[x]": "-2*pi*cos(2*pi*x)*sin(2*pi*y)",
                            "t[y]": "-2*pi*sin(2*pi*x)*cos(2*pi*y)"}},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "pint")], 0.127469, rtol=2e-5)
    assert np.isclose(res.errors[("L2-face", "pbndry")], 1.2962,
                      rtol=2e-5)
    assert np.isclose(res.errors[("L2", "u")], 0.814028, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "t")], 0.814028, rtol=2e-5)

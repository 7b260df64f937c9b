"""Regression parity: transient multiscale subgrid DtN.

Golds:
- thermal/2D_verification_multiscale_transient/mrhyde.gold
  (BWE/BDF1, 10x10 macro, refinements 0, 5 steps)
- thermal/2D_verification_multiscale_transient_DIRK/mrhyde.gold
  (DIRK-3,3, 4x4 macro, 4 steps)

The subgrid integrates synchronously with the macro stages
(reference: subgridDtN_solver.cpp:280-330 copies the macro butcher
tableau / BDF weights into the fine workset; fine stage/history
state here rides pvec["__ms"]).
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem

SRC = "(8*(pi*pi)*sin(2*pi*t)+2*pi*cos(2*pi*t))*sin(2*pi*x)*sin(2*pi*y)"
TRUE = "sin(2*pi*t)*sin(2.0*pi*x)*sin(2.0*pi*y)"


def _cfg(nx, solver_extra):
    return {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": nx, "NY": nx},
        "Functions": {"thermal source": SRC},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions":
                    {"e": {"all boundaries": "0.0"}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "transient", "final time": 1.0,
                   "allow backtracking": False, **solver_extra},
        "Postprocess": {"compute errors": True,
                        "True solutions": {"e": TRUE}},
        "Subgrid": {
            "usage": "1.0",
            "Mesh": {"shape": "quad", "refinements": 0, "dim": 2},
            "Physics": {"modules": "thermal"},
            "Discretization": {"order": {"e": 1}, "quadrature": 2},
            "Solver": {"solver": "transient",
                       "synchronous time stepping": True},
            "Postprocess": {"True solutions": {"e": TRUE}},
            "Functions": {"thermal source": SRC},
        },
    }


def _check(res, gold):
    hist = {round(t, 10): errs for t, errs in res.error_history}
    for t, l2, sub in gold:
        errs = hist[round(t, 10)]
        assert np.isclose(errs[("L2", "e")], l2, rtol=1e-4, atol=1e-12)
        assert np.isclose(errs[("Subgrid-L2", "e")], sub,
                          rtol=1e-4, atol=1e-12)


def test_bwe_gold():
    res = Problem(_cfg(10, {"number of steps": 5})).run()
    _check(res, [
        (0.0, 0.0, 0.0),
        (0.2, 0.0313206, 0.0224535),
        (0.4, 0.0294357, 0.0241644),
        (0.6, 0.0125585, 0.00694295),
        (0.8, 0.0371441, 0.0283982),
        (1.0, 0.0104475, 0.010655),
    ])


def test_dirk33_gold():
    res = Problem(_cfg(4, {"number of steps": 4,
                           "transient BDF order": 1,
                           "transient Butcher tableau": "DIRK-3,3",
                           "max nonlinear iters": 4})).run()
    _check(res, [
        (0.0, 0.0, 0.0),
        (0.25, 0.100298, 0.048258),
        (0.5, 0.0083698, 0.00933349),
        (0.75, 0.0996334, 0.047603),
        (1.0, 0.00829951, 0.00925458),
    ])

"""Regression parity: the wider thermal verification family.

Gold values from /root/reference/regression/thermal/<test>/mrhyde.gold:
transient (time-dependent source), nonzero Dirichlet (boundary L2
projection), high order (p4), tri mesh, 3D hex, mixed Dirichlet+Neumann.
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


def base_cfg(**mesh):
    m = {"dimension": 2, "element type": "quad", "NX": 40, "NY": 40}
    m.update(mesh)
    return {
        "Mesh": m,
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": "0.0"}},
                    "Initial conditions": {"e": "0.0"}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-7,
                   "max nonlinear iters": 2},
        "Postprocess": {"compute errors": True,
                        "True solutions": {"e": "sin(2*pi*x)*sin(2*pi*y)"}},
    }


@pytest.mark.slow
def test_transient_time_dependent_source():
    cfg = base_cfg()
    cfg["Functions"] = {"thermal source":
                        "(8*(pi*pi)*sin(2*pi*t)+2*pi*cos(2*pi*t))"
                        "*sin(2*pi*x)*sin(2*pi*y)"}
    cfg["Solver"] = {"solver": "transient",
                     "transient Butcher tableau": "BWE",
                     "transient BDF order": 1, "final time": 1.0,
                     "number of steps": 20, "nonlinear TOL": 1e-7,
                     "max nonlinear iters": 2}
    cfg["Postprocess"]["True solutions"] = {
        "e": "sin(2*pi*t)*sin(2*pi*x)*sin(2*pi*y)"}
    res = Problem(cfg).run()
    hist = dict((round(t, 10), e[("L2", "e")])
                for t, e in res.error_history)
    assert np.isclose(hist[0.9], 0.00509256, rtol=2e-5)
    assert np.isclose(hist[1.0], 0.00118468, rtol=2e-5)


@pytest.mark.slow
def test_nonzero_dirichlet_projection():
    cfg = base_cfg()
    cfg["Functions"] = {"thermal source": "2.0*sin(x)*sin(y)"}
    cfg["Physics"]["Dirichlet conditions"] = {
        "e": {"all boundaries": "sin(x)*sin(y)"}}
    cfg["Postprocess"]["True solutions"] = {
        "e": "sin(x)*sin(y)",
        "e face": "sin(x)*sin(y)",
        "grad(e)[x]": "cos(x)*sin(y)",
        "grad(e)[y]": "sin(x)*cos(y)"}
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "e")], 1.42007e-05, rtol=2e-5)
    assert np.isclose(res.errors[("L2-grad", "e")], 0.00278284, rtol=2e-5)
    assert np.isclose(res.errors[("L2-face", "e")], 6.31349e-06, rtol=2e-5)


def test_highorder_p4_blockwise_config():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 10, "NY": 10},
        "Functions": {"thermal source": "8*pi*pi*sin(2*pi*x)*sin(2*pi*y)"},
        "Physics": {"eblock-0_0": {
            "modules": "thermal",
            "Dirichlet conditions": {"e": {"all boundaries": "0.0"}},
            "Initial conditions": {"e": "0.0"}}},
        "Discretization": {"eblock-0_0": {"order": {"e": 4},
                                          "quadrature": 8}},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-11},
        "Postprocess": {"compute errors": True,
                        "True solutions": {"e": "sin(2*pi*x)*sin(2*pi*y)"}},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "e")], 8.59709e-07, rtol=2e-5)


@pytest.mark.slow
def test_tri_mesh():
    cfg = base_cfg(**{"element type": "tri"})
    cfg["Functions"] = {"thermal source":
                        "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"}
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "e")], 0.00354884, rtol=2e-5)


@pytest.mark.slow
def test_3d_hex():
    cfg = {
        "Mesh": {"dimension": 3, "element type": "hex",
                 "NX": 10, "NY": 10, "NZ": 10},
        "Functions": {"thermal source":
                      "12*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)*sin(2*pi*z)"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": "0.0"}},
                    "Initial conditions": {"e": "0.0"}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
        "Postprocess": {"compute errors": True,
                        "True solutions":
                            {"e": "sin(2*pi*x)*sin(2*pi*y)*sin(2*pi*z)"}},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "e")], 0.0116656, rtol=2e-5)


@pytest.mark.slow
def test_mixed_dirichlet_neumann():
    cfg = base_cfg()
    cfg["Functions"] = {"thermal source":
                        "8*pi*pi*sin(2*pi*x)*sin(2*pi*y)"}
    cfg["Physics"]["Dirichlet conditions"] = {"e": {"left": "0.0",
                                                    "right": "0.0"}}
    cfg["Physics"]["Neumann conditions"] = {
        "e": {"top": "2*pi*sin(2*pi*x)*cos(2*pi*y)",
              "bottom": "-2*pi*sin(2*pi*x)*cos(2*pi*y)"}}
    cfg["Solver"]["max nonlinear iters"] = 4
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "e")], 0.00102733, rtol=2e-5)


def test_multiblock_per_block_errors():
    """thermal/2D_multiblock gold: 2x2 element blocks each report
    their own L2 norm (all equal by symmetry): 0.000513878 x4."""
    import numpy as np
    from mrhyde_tpu.problem import Problem
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 10, "NY": 10, "Xblocks": 2, "Yblocks": 2},
        "Functions": {"thermal source": "2*(pi*pi)*sin(pi*x)*sin(pi*y)"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"scalar data": True,
                                             "e": {"top": 0.0,
                                                   "bottom": 0.0,
                                                   "left": 0.0,
                                                   "right": 0.0}},
                    "Initial conditions": {"scalar data": True,
                                           "e": 0.0}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "use strong DBCs": True},
        "Postprocess": {"compute errors": True,
                        "True solutions": {"e": "sin(pi*x)*sin(pi*y)"}},
    }
    res = Problem(cfg).run()
    for key in [("L2", "e"), ("L2@1", "e"), ("L2@2", "e"),
                ("L2@3", "e")]:
        assert np.isclose(res.errors[key], 0.000513878, rtol=1e-4)

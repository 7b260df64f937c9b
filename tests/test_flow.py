"""Regression parity: stokes/2D_verification_pspg and navierstokes/channel.

Gold values from /root/reference/regression/{stokes,navierstokes}/.
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


@pytest.mark.slow
def test_stokes_pspg():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad", "NX": 4, "NY": 4},
        "Physics": {"usePSPG": True, "modules": "Stokes",
                    "Dirichlet conditions": {
                        "ux": {"bottom": "0.0", "top": "0.0"},
                        "uy": {"bottom": "0.0", "top": "0.0"}}},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-10,
                   "max nonlinear iters": 2},
        "Discretization": {"order": {"ux": 1, "uy": 1, "pr": 1},
                           "quadrature": 2},
        "Postprocess": {"compute errors": True,
                        "True solutions": {"ux": "0.5*y*(1.0-y)",
                                           "uy": "0.0", "pr": "0.0"}},
        "Functions": {"source ux": "1.0"},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "ux")], 0.0188527, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "pr")], 0.193776, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "uy")], 0.00063617, rtol=2e-5)


@pytest.mark.slow
def test_navierstokes_channel():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "xmin": 0.0, "xmax": 5.0, "ymin": 0.0, "ymax": 1.0,
                 "NX": 50, "NY": 10},
        "Physics": {"modules": "navier stokes", "usePSPG": True,
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "ux": {"bottom": 0.0, "top": 0.0},
                        "uy": {"bottom": 0.0, "top": 0.0}},
                    "Initial conditions": {"scalar data": True,
                                           "ux": 0.0, "uy": 0.0,
                                           "pr": 0.0}},
        "Discretization": {"order": {"ux": 1, "uy": 1, "pr": 1},
                           "quadrature": 2},
        "Solver": {"solver": "steady-state", "use direct solver": True},
        "Postprocess": {"compute errors": True,
                        "True solutions": {"ux": "0.5*y*(1.0-y)",
                                           "uy": "0.0", "pr": "0.0"}},
        "Functions": {"source ux": "1.0"},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "ux")], 0.00198075, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "pr")], 0.0148536, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "uy")], 0.000169464, rtol=2e-5)


@pytest.mark.slow
def test_ns_boussinesq_buoyancy_coupling():
    """NS 'have_energy' coupling (navierstokes.cpp:134-147): with a
    temperature variable in the set, rho*beta*(T - T_ambient)*source_d
    enters the momentum equations. A vertical temperature gradient with
    gravity-like source drives flow that vanishes when beta = 0."""
    import copy
    base = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 8, "NY": 8},
        "Physics": {"modules": "navier stokes,thermal",
                    "usePSPG": True, "beta": 1.0, "T_ambient": 0.0,
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "ux": {"all boundaries": 0.0},
                        "uy": {"all boundaries": 0.0},
                        "e": {"left": 1.0, "right": 0.0}}},
        "Functions": {"source uy": "-1.0", "source ux": "0.0",
                      "thermal source": "0.0"},
        "Discretization": {"order": {"ux": 1, "uy": 1, "pr": 1,
                                     "e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "use direct solver": True,
                   "max nonlinear iters": 8, "nonlinear TOL": 1e-10},
        "Postprocess": {"compute errors": False},
    }
    p1 = Problem(copy.deepcopy(base))
    u1 = np.asarray(p1.run().u)
    gd = np.asarray(p1.disc.dofmap.all_dofs("ux"))
    vel1 = np.abs(u1[gd]).max()
    cfg0 = copy.deepcopy(base)
    cfg0["Physics"]["beta"] = 0.0
    p0 = Problem(cfg0)
    u0 = np.asarray(p0.run().u)
    vel0 = np.abs(u0[gd]).max()
    assert vel1 > 1e-6          # buoyancy drives flow
    assert vel0 < vel1 * 1e-3   # beta=0: no thermal forcing of ux

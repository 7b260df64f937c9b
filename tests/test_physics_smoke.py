"""Smoke tests: every registered physics module assembles and solves."""

import numpy as np
import pytest

from mrhyde_tpu.physics.registry import available_modules, import_physics
from mrhyde_tpu.problem import Problem

SMOKE = {
    "helmholtz": {
        "Functions": {"omega2r": "1.0", "c2r_x": "1.0", "c2r_y": "1.0",
                      "source_r": "1.0"},
        "Physics": {"modules": "helmholtz",
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "ureal": {"all boundaries": 0.0},
                        "uimag": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"ureal": 1, "uimag": 1}},
    },
    "shallow ice": {
        "Functions": {"source": "1.0"},
        "Physics": {"modules": "shallow ice",
                    "Dirichlet conditions": {"scalar data": True,
                                             "s": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"s": 1}},
    },
    "Kuramoto-Sivashinsky": {
        "Physics": {"modules": "Kuramoto-Sivashinsky",
                    "Initial conditions": {"u": "0.1*sin(2*pi*x)",
                                           "w": "0.0"}},
        "Discretization": {"order": {"u": 1, "w": 1}},
        "Solver": {"solver": "transient", "number of steps": 2,
                   "final time": 0.01,
                   "transient Butcher tableau": "BWE"},
    },
    "hartmann": {
        "Physics": {"modules": "hartmann",
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "u": {"all boundaries": 0.0},
                        "b": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"u": 1, "b": 1}},
    },
    "llamas": {
        "Functions": {"whatever": "1.0", "c": "1.0"},
        "Physics": {"modules": "llamas",
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "llama": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"llama": 1}},
    },
    "msphasefield": {
        "Physics": {"modules": "msphasefield", "number_phases": 2,
                    "Initial conditions": {
                        "phi1": "0.5+0.1*sin(2*pi*x)",
                        "phi2": "0.5-0.1*sin(2*pi*x)"}},
        "Discretization": {"order": {"phi1": 1, "phi2": 1}},
        "Solver": {"solver": "transient", "number of steps": 2,
                   "final time": 0.01,
                   "transient Butcher tableau": "BWE"},
    },
    "inc sat": {
        "Functions": {"ux": "1.0", "uy": "0.0"},
        "Physics": {"modules": "inc sat",
                    "Initial conditions": {"S": "exp(-10*(x-0.3)*(x-0.3))"}},
        "Discretization": {"order": {"S": 1}},
        "Solver": {"solver": "transient", "number of steps": 2,
                   "final time": 0.001,
                   "transient Butcher tableau": "BWE"},
    },
    "physicsTest": {
        "Functions": {"test source": "1.0"},
        "Physics": {"modules": "physicsTest",
                    "Dirichlet conditions": {"scalar data": True,
                                             "e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 1}},
    },
}


@pytest.mark.parametrize("name", sorted(SMOKE))
@pytest.mark.slow
def test_module_smoke(name):
    sub = SMOKE[name]
    cfg = {"Mesh": {"dimension": 2, "element type": "quad",
                    "NX": 4, "NY": 4},
           "Solver": {"solver": "steady-state", "max nonlinear iters": 5},
           "Postprocess": {"compute errors": False}}
    cfg.update({k: v for k, v in sub.items() if k != "Solver"})
    if "Solver" in sub:
        cfg["Solver"] = sub["Solver"]
    res = Problem(cfg).run()
    assert np.isfinite(np.asarray(res.u)).all()
    assert float(np.abs(np.asarray(res.u)).max()) < 1e6


def test_registry_lists_all():
    mods = available_modules()
    for name in ("thermal", "ODE", "cdr", "Burgers", "navier stokes",
                 "Stokes", "linearelasticity", "shallow water", "porous",
                 "porous mixed", "maxwell", "helmholtz", "shallow ice",
                 "Kuramoto-Sivashinsky", "hartmann", "llamas",
                 "msphasefield", "inc sat", "physicsTest"):
        assert name in mods, name


@pytest.mark.slow
def test_vdns_smoke():
    cfg = {"Mesh": {"dimension": 2, "element type": "quad",
                    "NX": 3, "NY": 3},
           "Functions": {"rho": "1.0", "mu": "0.01", "lambda": "0.01",
                         "cp": "1.0", "source T": "0.1"},
           "Physics": {"modules": "VDNS",
                       "Dirichlet conditions": {
                           "scalar data": True,
                           "ux": {"all boundaries": 0.0},
                           "uy": {"all boundaries": 0.0},
                           "T": {"all boundaries": 1.0}},
                       "Initial conditions": {
                           "scalar data": True, "ux": 0.0, "uy": 0.0,
                           "pr": 0.0, "T": 1.0}},
           "Discretization": {"order": {"ux": 1, "uy": 1, "pr": 1,
                                        "T": 1}},
           "Solver": {"solver": "transient", "number of steps": 2,
                      "final time": 0.01,
                      "transient Butcher tableau": "BWE",
                      "max nonlinear iters": 5},
           "Postprocess": {"compute errors": False}}
    res = Problem(cfg).run()
    assert np.isfinite(np.asarray(res.u)).all()


@pytest.mark.slow
def test_maxwells_fp_smoke():
    cfg = {"Mesh": {"dimension": 2, "element type": "quad",
                    "NX": 3, "NY": 3},
           "Functions": {"omega": "1.0", "Jxr": "1.0"},
           "Physics": {"modules": "maxwells_freq_pot",
                       "Dirichlet conditions": {
                           "scalar data": True,
                           "Arx": {"all boundaries": 0.0},
                           "Aix": {"all boundaries": 0.0},
                           "Ary": {"all boundaries": 0.0},
                           "Aiy": {"all boundaries": 0.0},
                           "phir": {"all boundaries": 0.0},
                           "phii": {"all boundaries": 0.0}}},
           "Discretization": {"quadrature": 2},
           "Solver": {"solver": "steady-state", "max nonlinear iters": 3},
           "Postprocess": {"compute errors": False}}
    res = Problem(cfg).run()
    assert np.isfinite(np.asarray(res.u)).all()


@pytest.mark.slow
def test_crystal_elasticity_isotropic_matches_le():
    # with C11 = lambda + 2 mu, C12 = lambda, C44 = mu the cubic tensor
    # contracts to isotropic linear elasticity exactly (the full-tensor
    # contraction gives sigma_01 = 2 c66 eps_01, so c66 = mu; note the
    # REFERENCE defaults use C44 = 2 mu from E=1/nu=0.4, which is NOT
    # isotropic-equivalent -- CrystalElasticity.cpp:42-47)
    base = {
        "Mesh": {"dimension": 2, "element type": "quad", "NX": 6, "NY": 6},
        "Functions": {"source dx": "1.0", "source dy": "0.5",
                      "lambda": "1.0", "mu": "0.5"},
        "Discretization": {"order": {"dx": 1, "dy": 1}},
        "Solver": {"solver": "steady-state", "max nonlinear iters": 2},
        "Postprocess": {"compute errors": False},
    }
    import copy
    cfg1 = copy.deepcopy(base)
    cfg1["Physics"] = {"modules": "linearelasticity",
                       "Dirichlet conditions": {
                           "scalar data": True,
                           "dx": {"all boundaries": 0.0},
                           "dy": {"all boundaries": 0.0}}}
    cfg2 = copy.deepcopy(base)
    cfg2["Physics"] = {"modules": "crystal elasticity",
                       "Crystal elastic parameters": {
                           "C11": 2.0, "C12": 1.0, "C44": 0.5},
                       "Dirichlet conditions": {
                           "scalar data": True,
                           "dx": {"all boundaries": 0.0},
                           "dy": {"all boundaries": 0.0}}}
    u1 = np.asarray(Problem(cfg1).run().u)
    u2 = np.asarray(Problem(cfg2).run().u)
    np.testing.assert_allclose(u1, u2, rtol=1e-10, atol=1e-12)


def test_porous_mixed_wells():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad", "NX": 6, "NY": 6},
        "Physics": {"modules": "porous mixed",
                    "Wells": {"prod1": {"type": "production",
                                        "location": [0.5, 0.5],
                                        "bottom hole pressure": -1.0}},
                    "Dirichlet conditions": {"p": {"left": "0.0",
                                                   "right": "0.0",
                                                   "top": "0.0",
                                                   "bottom": "0.0"}}},
        "Discretization": {"order": {"p": 0, "u": 1}},
        "Solver": {"solver": "steady-state", "max nonlinear iters": 3},
        "Postprocess": {"compute errors": False},
    }
    res = Problem(cfg).run()
    u = np.asarray(res.u)
    assert np.isfinite(u).all()
    # the production well draws pressure down somewhere
    assert u.min() < -1e-6

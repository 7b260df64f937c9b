"""Regression parity: maxwell_fp/3D_verfication (frequency-domain
Maxwell via potentials, test=2 manufactured solution).

Gold: /root/reference/regression/maxwell_fp/3D_verfication/mrhyde.gold
— 8 L2 errors on a 5^3 hex mesh with complex x-dependent permeability
mu = (2+i)/(x^2+1) and permittivity eps = (x^2+1)(1+i). The test=2
coefficient/source functions (maxwells_fp.cpp:820-965
getPermeability/getInteriorCurrent/getInteriorCharge) are transcribed
as expression-DSL deck functions.
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem

FNS = {
    "sx": "sin(pi*x)", "sy": "sin(pi*y)", "sz": "sin(pi*z)",
    "cx": "cos(pi*x)", "cy": "cos(pi*y)", "cz": "cos(pi*z)",
    "sss": "sx*sy*sz",
    "mur": "2.0/(x*x+1.0)", "mui": "1.0/(x*x+1.0)",
    "epsr": "x*x+1.0", "epsi": "x*x+1.0",
    "omega": "1.0",
    "Jxr": "(9*pi*pi*sss)/5 - 4*x*sss + (9*x*x*pi*pi*sss)/5 - "
           "(6*x*pi*cx*sy*sz)/5 + (6*x*pi*cy*sx*sz)/5 - "
           "(12*x*pi*cz*sx*sy)/5",
    "Jyr": "0.0-(3*pi*sz*(3*pi*sx*sy - 2*x*cx*sy - 2*x*cy*sx + "
           "3*x*x*pi*sx*sy))/5",
    "Jzr": "(6*pi*sy*(3*pi*sx*sz - 2*x*cx*sz + x*cz*sx + "
           "3*x*x*pi*sx*sz))/5",
    "Jxi": "(3*pi*pi*sss)/5 - 2*x*x*sss - 2*sss + "
           "(3*x*x*pi*pi*sss)/5 - (2*x*pi*cx*sy*sz)/5 + "
           "(2*x*pi*cy*sx*sz)/5 - (4*x*pi*cz*sx*sy)/5",
    "Jyi": "(3*sz*((10*sx*sy)/3 - pi*pi*sx*sy + (10*x*x*sx*sy)/3 - "
           "x*x*pi*pi*sx*sy + (2*x*pi*cx*sy)/3 + (2*x*pi*cy*sx)/3))/5",
    "Jzi": "0.0-(6*sy*((10*sx*sz)/3 - pi*pi*sx*sz + (10*x*x*sx*sz)/3 - "
           "x*x*pi*pi*sx*sz + (2*x*pi*cx*sz)/3 - (x*pi*cz*sx)/3))/5",
    "rhor": "2*sss*(3*x*x - 2*x + 3)",
    "rhoi": "0.0-2*sy*sz*(sx - 3*pi*pi*sx + x*x*sx - 3*x*x*pi*pi*sx + "
            "2*x*pi*cx)",
}

VARS = ("Arx", "Aix", "Ary", "Aiy", "Arz", "Aiz", "phir", "phii")
GOLD = {"Arx": 0.0115417, "Aix": 0.013503, "phir": 0.0108162,
        "phii": 0.0124067, "Ary": 0.0104865, "Aiy": 0.0126923,
        "Arz": 0.0209644, "Aiz": 0.0253728}


@pytest.mark.slow
def test_maxwell_fp_3d_verification_matches_gold():
    cfg = {
        "Mesh": {"dimension": 3, "element type": "hex",
                 "NX": 5, "NY": 5, "NZ": 5},
        "Physics": {"eblock-0_0_0": {
            "modules": "maxwells_freq_pot",
            "Dirichlet conditions": {v: {"all boundaries": "0.0"}
                                     for v in VARS}}},
        "Functions": FNS,
        "Discretization": {"eblock-0_0_0": {
            "order": {v: 1 for v in VARS}, "quadrature": 2}},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-12,
                   "max nonlinear iters": 10, "use direct solver": True},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "Arx": "sin(pi*x)*sin(pi*y)*sin(pi*z)",
                            "Aix": "sin(pi*x)*sin(pi*y)*sin(pi*z)",
                            "Ary": "-1.0*sin(pi*x)*sin(pi*y)*sin(pi*z)",
                            "Aiy": "-1.0*sin(pi*x)*sin(pi*y)*sin(pi*z)",
                            "Arz": "2.0*sin(pi*x)*sin(pi*y)*sin(pi*z)",
                            "Aiz": "2.0*sin(pi*x)*sin(pi*y)*sin(pi*z)",
                            "phir": "sin(pi*x)*sin(pi*y)*sin(pi*z)",
                            "phii": "sin(pi*x)*sin(pi*y)*sin(pi*z)"}},
    }
    res = Problem(cfg).run()
    for v, gold in GOLD.items():
        assert np.isclose(res.errors[("L2", v)], gold, rtol=2e-5), \
            (v, float(res.errors[("L2", v)]), gold)

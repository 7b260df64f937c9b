"""Regression parity: le/2D_manufactured, shallowwater/droptest,
porous/2D_verification."""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


@pytest.mark.slow
def test_linearelasticity_2d_manufactured():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 40, "NY": 40},
        "Physics": {"modules": "linearelasticity",
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "dx": {"all boundaries": 0.0},
                        "dy": {"all boundaries": 0.0}},
                    "Initial conditions": {"scalar data": True,
                                           "dx": 0.0, "dy": 0.0}},
        "Functions": {
            "lambda": "1.0", "mu": "1.0", "A": "1.0", "B": "2.0",
            "dxxx": "(A*pi)*(A*pi)*sin(A*pi*x)*sin(A*pi*y)",
            "dxxy": "-1.0*(A*pi)*(A*pi)*cos(A*pi*x)*cos(A*pi*y)",
            "dxyy": "(A*pi)*(A*pi)*sin(A*pi*x)*sin(A*pi*y)",
            "dyxx": "(B*pi)*(B*pi)*sin(B*pi*x)*sin(B*pi*y)",
            "dyxy": "-1.0*(B*pi)*(B*pi)*cos(B*pi*x)*cos(B*pi*y)",
            "dyyy": "(B*pi)*(B*pi)*sin(B*pi*x)*sin(B*pi*y)",
            "source dx": "(lambda+2.0*mu)*dxxx + mu*(dxyy+dyxy)"
                         " + lambda*dyxy",
            "source dy": "(lambda+2.0*mu)*dyyy + mu*(dyxx+dxxy)"
                         " + lambda*dxxy",
        },
        "Discretization": {"order": {"dx": 1, "dy": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "max nonlinear iters": 2},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "dx": "sin(A*pi*x)*sin(A*pi*y)",
                            "dy": "sin(B*pi*x)*sin(B*pi*y)"}},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "dx")], 0.000770252, rtol=2e-5)
    assert np.isclose(res.errors[("L2", "dy")], 0.00121848, rtol=2e-5)


@pytest.mark.slow
def test_shallowwater_droptest():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 40, "NY": 40},
        "Physics": {"modules": "shallow water",
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "Hu": {"left": 0.0, "right": 0.0},
                        "Hv": {"top": 0.0, "bottom": 0.0}},
                    "Initial conditions": {"H": "1.0 + 0.1*exp(hump)",
                                           "Hu": "0.0", "Hv": "0.0"}},
        "Discretization": {"eblock-0_0": {
            "order": {"H": 1, "Hu": 1, "Hv": 1}, "quadrature": 2}},
        "Solver": {"solver": "transient",
                   "transient Butcher tableau": "DIRK-1,2",
                   "final time": 5.0e-3, "delta t": 1.0e-3},
        "Postprocess": {"compute errors": True,
                        "True solutions": {"H": "0.0", "Hu": "0.0",
                                           "Hv": "0.0"}},
        "Functions": {"hump":
                      "-100.0*(x-0.5)*(x-0.5) - 100*(y-0.5)*(y-0.5)"},
    }
    res = Problem(cfg).run()
    hist_H = dict((round(t, 10), e[("L2", "H")])
                  for t, e in res.error_history)
    hist_Hv = dict((round(t, 10), e[("L2", "Hv")])
                   for t, e in res.error_history)
    assert np.isclose(hist_H[0.005], 1.00321, rtol=2e-5)
    assert np.isclose(hist_Hv[0.005], 0.0121219, rtol=2e-4)


def test_porous_2d_verification():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 40, "NY": 40},
        "Functions": {"porous source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Physics": {"modules": "porous",
                    "Dirichlet conditions": {"scalar data": True,
                                             "p": {"all boundaries": 0.0}},
                    "Initial conditions": {"scalar data": True, "p": 0.0}},
        "Discretization": {"order": {"p": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-7,
                   "max nonlinear iters": 2},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "p": "sin(2*pi*x)*sin(2*pi*y)",
                            "p face": "sin(2*pi*x)*sin(2*pi*y)",
                            "grad(p)[x]": "2*pi*cos(2*pi*x)*sin(2*pi*y)",
                            "grad(p)[y]": "2*pi*sin(2*pi*x)*cos(2*pi*y)"}},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "p")], 0.00102776, rtol=2e-5)
    assert np.isclose(res.errors[("L2-grad", "p")], 0.201394, rtol=2e-5)
    assert np.isclose(res.errors[("L2-face", "p")], 0.0017603, rtol=2e-4)


@pytest.mark.slow
def test_thermoelastic_transient_gold():
    """thermoelastic/2D_transient: thermal + linearelasticity in one
    set; the stress picks up -alpha_T (T - T_ambient)(3 lambda + 2 mu) I
    automatically when 'e' shares the set (reference:
    linearelasticity.cpp e_num coupling)."""
    import yaml
    d = "/root/reference/regression/thermoelastic/2D_transient"
    mc = yaml.safe_load(open(f"{d}/input.yaml"))["ANONYMOUS"]
    cfg = {k: mc[k] for k in ("Mesh", "Physics", "Discretization",
                              "Solver", "Postprocess", "Functions")}
    from mrhyde_tpu.problem import make_problem
    res = make_problem(cfg).run()
    hist = {round(t, 10): e for t, e in res.error_history}
    gold = [(0.1, 0.331419, 3.15996e-08),
            (0.5, 0.496843, 4.73722e-08),
            (1.0, 0.498964, 4.75745e-08)]
    for t, ge, gd in gold:
        errs = hist[round(t, 10)]
        assert np.isclose(errs[("L2", "e")], ge, rtol=1e-4)
        assert np.isclose(errs[("L2", "dx")], gd, rtol=1e-4)
        assert np.isclose(errs[("L2", "dy")], gd, rtol=1e-4)

"""Manufactured-solution verification for the two thin demo modules.

Reference weak forms:
- shallowice (src/physics/shallowice.cpp:50-110):
  (s_t - source, v) + (diffusion grad s, grad v)
- llamas (src/physics/llamas.hpp volumeResidual):
  (grad llama, grad v) + (c llama - source, v)

Neither has a regression deck, so these pin the weak forms with
manufactured solutions: steady shallowice must be DISCRETELY identical
to thermal (same bilinear form at unit coefficients), and llamas'
Helmholtz-like form must converge at O(h^2).
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


def _cfg(modules, funcs, var, order=1, nx=16):
    return {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": nx, "NY": nx},
        "Functions": funcs,
        "Physics": {"modules": modules,
                    "Dirichlet conditions": {
                        "scalar data": True,
                        var: {"all boundaries": 0.0}}},
        "Discretization": {"order": {var: order}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "max nonlinear iters": 2},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            var: "sin(2*pi*x)*sin(2*pi*y)"}},
    }


SRC = "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"


def _l2(res, var):
    return res.errors[("L2", var)]


@pytest.mark.slow
def test_shallowice_steady_equals_thermal():
    """At unit diffusion / unit thermal coefficients the two modules
    assemble the SAME discrete system; errors must match to solver
    tolerance, and hit the thermal 2D_verification gold line scaled to
    this mesh."""
    r_ice = Problem(_cfg("shallow ice", {"source": SRC}, "s")).run()
    r_th = Problem(_cfg("thermal", {"thermal source": SRC}, "e")).run()
    e_ice = _l2(r_ice, "s")
    e_th = _l2(r_th, "e")
    assert abs(e_ice - e_th) < 1e-10 * max(1.0, abs(e_th))


@pytest.mark.slow
def test_shallowice_transient_matches_thermal():
    """The time term (s_t, v) must also match thermal's at unit
    specific heat: BDF1 transient runs agree step by step."""
    def run(modules, funcs, var):
        cfg = _cfg(modules, funcs, var, nx=10)
        cfg["Physics"]["Initial conditions"] = {"scalar data": True,
                                                var: 0.0}
        cfg["Solver"] = {"solver": "transient", "final time": 0.2,
                         "number of steps": 4}
        return Problem(cfg).run()

    r_ice = run("shallow ice", {"source": SRC}, "s")
    r_th = run("thermal", {"thermal source": SRC}, "e")
    assert len(r_ice.error_history) >= 2
    for (t_i, errs_i), (t_t, errs_t) in zip(r_ice.error_history,
                                            r_th.error_history):
        assert t_i == t_t
        e_i = errs_i[("L2", "s")]
        e_t = errs_t[("L2", "e")]
        assert abs(e_i - e_t) < 1e-9 * max(1.0, abs(e_t))


@pytest.mark.parametrize("nx", [8, 16])
def test_llamas_manufactured_convergence(nx):
    """-lap(u) + c u = f with u = sin(2pix)sin(2piy), c=1:
    f = (8pi^2 + 1) u. O(h^2) => error(8) / error(16) ~ 4."""
    funcs = {"whatever": "(8*(pi*pi)+1.0)*sin(2*pi*x)*sin(2*pi*y)",
             "c": "1.0"}
    res = Problem(_cfg("llamas", funcs, "llama", nx=nx)).run()
    err = _l2(res, "llama")
    if nx == 8:
        test_llamas_manufactured_convergence.e8 = err
    else:
        ratio = test_llamas_manufactured_convergence.e8 / err
        assert 3.5 < ratio < 4.5, ratio
    assert err < 0.2


def test_llamas_reaction_term_active():
    """c=0 vs c=1e3 must differ (pins that the reaction term is wired
    through the qp density, not dropped)."""
    funcs0 = {"whatever": SRC, "c": "0.0"}
    funcs1 = {"whatever": SRC, "c": "1000.0"}
    e0 = _l2(Problem(_cfg("llamas", funcs0, "llama", nx=8)).run(),
             "llama")
    e1 = _l2(Problem(_cfg("llamas", funcs1, "llama", nx=8)).run(),
             "llama")
    assert abs(e0 - e1) > 1e-3

"""Adjoint gradient correctness: jax.grad through the implicit solves
vs central finite differences (the reference enforces the same check
via ROL::checkGradient, analysisManager.cpp:530-560 and the
2d_gradient_check_* regression family)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mrhyde_tpu.analysis.forward_ad import DifferentiableForward
from mrhyde_tpu.postprocess.objectives import (ObjectiveManager,
                                               ObjectiveSpec)
from mrhyde_tpu.problem import Problem


def make_problem(transient=False):
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 8, "NY": 8},
        "Functions": {"thermal source":
                      "src_mag*8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"scalar data": True,
                                             "e": {"all boundaries": 0.0}},
                    "Initial conditions": {"scalar data": True, "e": 0.0}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "max nonlinear iters": 5},
        "Parameters": {"src_mag": {"type": "scalar", "value": 1.3,
                                   "usage": "active"}},
    }
    if transient:
        cfg["Solver"] = {"solver": "transient",
                         "transient Butcher tableau": "DIRK-2,2",
                         "transient BDF order": 1,
                         "final time": 0.3, "number of steps": 3}
    return Problem(cfg)


def integrated_objective(problem):
    spec = ObjectiveSpec(name="obj", otype="integrated response",
                         weight=2.0, target=0.1, response="e*e")
    return ObjectiveManager(problem.disc, problem.fm, [spec],
                            problem.params)


@pytest.mark.parametrize("transient", [False, True])
def test_adjoint_matches_fd(transient):
    p = make_problem(transient)
    om = integrated_objective(p)
    fwd = DifferentiableForward(p, om.value)
    pvec = {"src_mag": jnp.asarray(1.3)}
    val, grad = fwd.value_and_gradient(pvec)
    fd = fwd.fd_gradient(pvec, eps=1e-5)
    assert np.isfinite(float(val))
    assert abs(float(val)) > 1e-12
    rel = abs(float(grad["src_mag"]) - fd["src_mag"]) / (
        abs(fd["src_mag"]) + 1e-14)
    assert rel < 1e-6, (float(grad["src_mag"]), fd["src_mag"])


def test_sensor_objective_gradient():
    p = make_problem(False)
    spec = ObjectiveSpec(name="sens", otype="sensors", weight=1.0,
                         response="e",
                         sensor_points=np.array([[0.26, 0.26],
                                                 [0.51, 0.76]]),
                         sensor_times=np.array([0.0]),
                         sensor_data=np.array([[0.4], [0.2]]))
    om = ObjectiveManager(p.disc, p.fm, [spec], p.params)
    fwd = DifferentiableForward(p, om.value)
    pvec = {"src_mag": jnp.asarray(1.3)}
    val, grad = fwd.value_and_gradient(pvec)
    fd = fwd.fd_gradient(pvec, eps=1e-5)
    rel = abs(float(grad["src_mag"]) - fd["src_mag"]) / (
        abs(fd["src_mag"]) + 1e-14)
    assert rel < 1e-6


@pytest.mark.parametrize("transient", [False, True])
def test_hessian_vector_matches_fd(transient):
    """d2J/dp2 . v via reverse-over-reverse AD through the implicit
    stage solves vs a central difference of the gradient (the
    reference's ROL checkHessVec)."""
    p = make_problem(transient)
    om = integrated_objective(p)
    fwd = DifferentiableForward(p, om.value)
    pvec = {"src_mag": jnp.asarray(1.3)}
    vec = {"src_mag": jnp.asarray(1.0)}
    hv = fwd.hvp(pvec, vec)
    fd = fwd.fd_hvp(pvec, vec, eps=1e-4)
    a, b = float(hv["src_mag"]), float(fd["src_mag"])
    assert np.isfinite(a) and abs(b) > 1e-10
    assert abs(a - b) <= 2e-4 * max(1.0, abs(b))

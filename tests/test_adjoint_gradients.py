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
@pytest.mark.slow
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


@pytest.mark.slow
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
@pytest.mark.slow
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


def test_apply_rowfix_transpose_matches_dense():
    """BlockJacobian.apply_rowfix/_T vs the dense row-fixed operator
    (the adjoint-consistent A of analysis/adjoint.py)."""
    from mrhyde_tpu.analysis.adjoint import _dense_rowfix
    from mrhyde_tpu.assembly.assembler import TimeCoeffs

    p = make_problem()
    asm = p.assembler
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    rng = np.random.RandomState(3)
    u = jnp.asarray(rng.randn(p.n_dof))
    J = asm.jacobian(u, tc, {"src_mag": jnp.asarray(1.3)})
    A = np.asarray(_dense_rowfix(J))
    v = rng.randn(p.n_dof)
    np.testing.assert_allclose(np.asarray(J.apply_rowfix(jnp.asarray(v))),
                               A @ v, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(J.apply_rowfix_T(jnp.asarray(v))), A.T @ v,
        rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_matrix_free_stage_solver_matches_dense():
    """linear='iterative' reproduces the dense implicit solve AND its
    gradient on a small problem (same custom_vjp, Krylov inside)."""
    import jax

    p = make_problem()
    obj = integrated_objective(p)

    def grad_of(linear):
        d = DifferentiableForward(p, obj.value)
        from mrhyde_tpu.analysis.adjoint import make_stage_solver
        d.stage_solve = make_stage_solver(p.assembler, linear=linear,
                                          gmres_m=40, gmres_restarts=4)
        vfun = lambda pv: d.objective(pv)
        v, g = jax.value_and_grad(vfun)({"src_mag": jnp.asarray(1.3)})
        return float(v), float(g["src_mag"])

    vd, gd = grad_of("dense")
    vi, gi = grad_of("iterative")
    assert vi == pytest.approx(vd, rel=1e-9)
    assert gi == pytest.approx(gd, rel=1e-8)


@pytest.mark.slow
def test_matrix_free_inversion_at_scale():
    """>=100k-DOF inversion forward+gradient WITHOUT a dense Jacobian
    (dense would need ~90 GB); gradient FD-checked. This is the
    reference's adjoint-through-Belos contract at scale
    (solverManager.cpp:1181,1387-1460)."""
    import jax

    n = 320
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": n, "NY": n},
        "Functions": {"thermal source":
                      "src_mag*8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"scalar data": True,
                                             "e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
        "Parameters": {"src_mag": {"type": "scalar", "value": 1.3,
                                   "usage": "active"}},
    }
    p = Problem(cfg)
    assert p.n_dof >= 100_000
    obj = integrated_objective(p)
    d = DifferentiableForward(p, obj.value, newton_maxiter=2)
    assert p.n_dof > 4096   # auto => iterative path

    vfun = lambda pv: d.objective(pv)
    v0, g = jax.value_and_grad(vfun)({"src_mag": jnp.asarray(1.3)})
    g = float(g["src_mag"])
    h = 1e-4
    fp = float(vfun({"src_mag": jnp.asarray(1.3 + h)}))
    fm = float(vfun({"src_mag": jnp.asarray(1.3 - h)}))
    fd = (fp - fm) / (2 * h)
    assert g == pytest.approx(fd, rel=1e-6)

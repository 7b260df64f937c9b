"""Discretized (field) parameters: gradients + source-field inversion
(the reference's 2d_source_inversion family, parameterManager.cpp:272)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mrhyde_tpu.analysis.forward_ad import DifferentiableForward
from mrhyde_tpu.analysis.optimization import lbfgs_solve
from mrhyde_tpu.postprocess.objectives import (ObjectiveManager,
                                               ObjectiveSpec)
from mrhyde_tpu.problem import Problem


def make_problem():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad", "NX": 6, "NY": 6},
        "Functions": {"thermal source": "src_field"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"scalar data": True,
                                             "e": {"all boundaries": 0.0}},
                    "Initial conditions": {"scalar data": True, "e": 0.0}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "max nonlinear iters": 3},
        "Parameters": {"src_field": {"usage": "discretized",
                                     "basis": "HGRAD", "order": 1,
                                     "value": 1.0}},
    }
    return Problem(cfg)


@pytest.mark.slow
def test_field_parameter_gradient_matches_fd():
    p = make_problem()
    spec = ObjectiveSpec(name="obj", otype="integrated response",
                         weight=1.0, target=0.05, response="e*e")
    om = ObjectiveManager(p.disc, p.fm, [spec], p.params)
    om.field_params = p.assembler.field_params
    fwd = DifferentiableForward(p, om.value)
    n_p = p.assembler.field_params["src_field"]["n_dof"]
    rng = np.random.RandomState(0)
    pvec = {"src_field": jnp.asarray(1.0 + 0.3 * rng.rand(n_p))}
    val, grad = fwd.value_and_gradient(pvec)
    g = np.asarray(grad["src_field"])
    assert np.isfinite(float(val)) and np.isfinite(g).all()
    # FD check along a random direction
    d = rng.normal(size=n_p)
    d /= np.linalg.norm(d)
    eps = 1e-6
    fp = float(fwd.objective({"src_field": pvec["src_field"]
                              + eps * jnp.asarray(d)}))
    fmn = float(fwd.objective({"src_field": pvec["src_field"]
                               - eps * jnp.asarray(d)}))
    fd = (fp - fmn) / (2 * eps)
    assert abs(fd - g @ d) / (abs(fd) + 1e-14) < 1e-6


@pytest.mark.slow
def test_source_field_inversion_reduces_misfit():
    # data generated with src = 10*sin(pi*x)*sin(pi*y); invert from a
    # flat initial guess using sensor data
    gen = make_problem()
    coords = gen.assembler.field_params["src_field"]["dof_coords"]
    true_field = 10 * np.sin(np.pi * coords[:, 0]) \
        * np.sin(np.pi * coords[:, 1])
    res = gen.forward(pvec={"src_field": jnp.asarray(true_field)})
    pts = np.array([[0.3, 0.3], [0.7, 0.4], [0.5, 0.8], [0.2, 0.6]])
    from mrhyde_tpu.postprocess.fields import PointFieldContext, \
        locate_points
    eids, refs = locate_points(gen.mesh, pts)
    ctx = PointFieldContext(gen.disc, eids, refs, pts, res.u)
    data = np.asarray(ctx.resolve("e"))[:, None]

    p = make_problem()
    spec = ObjectiveSpec(name="sens", otype="sensors", weight=1.0,
                         response="e", sensor_points=pts,
                         sensor_times=np.array([0.0]),
                         sensor_data=data)
    om = ObjectiveManager(p.disc, p.fm, [spec], p.params)
    om.field_params = p.assembler.field_params
    fwd = DifferentiableForward(p, om.value)
    pm = p.param_manager

    def vag(x):
        v, g = fwd.value_and_gradient(pm.unflatten(jnp.asarray(x)))
        return float(v), np.asarray(pm.flatten(g))

    x0 = np.asarray(pm.flatten(pm.pvec()))
    f0, _ = vag(x0)
    out = lbfgs_solve(vag, x0, maxiter=30, gtol=1e-12)
    assert out.value < 1e-3 * f0

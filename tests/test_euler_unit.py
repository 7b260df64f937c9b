"""Unit tests mirroring the reference's Euler physics unit tests
(reference: unit_tests/physics/Euler.cpp — flux-Jacobian
eigendecomposition in 1/2/3D, thermodynamic props)."""

import numpy as np
import pytest

from mrhyde_tpu.physics.euler import (eigendecomp_flux_jacobian,
                                      normal_flux_jacobian)
from mrhyde_tpu.problem import Problem


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_eigendecomposition_reconstructs_jacobian(dim):
    rng = np.random.RandomState(dim)
    rho = 1.2
    vel = rng.uniform(-0.3, 0.3, size=dim)
    p = 1.1
    gamma = 1.4
    rhoE = p / (gamma - 1) + 0.5 * rho * (vel @ vel)
    state = np.concatenate([[rho], rho * vel, [rhoE]])
    n = rng.normal(size=dim)
    n /= np.linalg.norm(n)
    A = np.asarray(normal_flux_jacobian(state, n, gamma))
    L, lam, R = eigendecomp_flux_jacobian(state, n, gamma)
    np.testing.assert_allclose(R @ np.diag(lam) @ L, A,
                               rtol=1e-10, atol=1e-10)
    # analytic eigenvalues un -+ a
    a = np.sqrt(gamma * p / rho)
    un = vel @ n
    assert np.isclose(lam[0], un - a) and np.isclose(lam[-1], un + a)


@pytest.mark.slow
def test_euler_acoustic_pulse_runs():
    # smoke: small acoustic perturbation on a periodic-free box stays
    # bounded over a few explicit steps
    cfg = {
        "Mesh": {"dimension": 1, "element type": "interval", "NX": 32},
        "Physics": {"modules": "Euler", "gamma": 1.4,
                    "max EV stabilization": True,
                    "Initial conditions": {
                        "rho": "1.0 + 0.01*exp(-200*(x-0.5)*(x-0.5))",
                        "rhoux": "0.0",
                        "rhoE": "(1.0/0.4) + 0.01*exp(-200*(x-0.5)*(x-0.5))"},
                    # reflective ends = slip walls (euler.cpp
                    # computeBoundaryTerm slip branch)
                    "Slip conditions": {
                        "rho": {"left": "0", "right": "0"}}},
        "Discretization": {"order": {"rho": 1, "rhoux": 1, "rhoE": 1},
                           "quadrature": 2},
        "Solver": {"solver": "transient", "final time": 0.02,
                   "number of steps": 4,
                   "transient Butcher tableau": "DIRK-1,2",
                   "max nonlinear iters": 6},
        "Postprocess": {"compute errors": False},
    }
    res = Problem(cfg).run()
    u = np.asarray(res.u)
    assert np.isfinite(u).all()
    assert abs(u).max() < 10.0


@pytest.mark.slow
def test_cns_viscous_pulse_decays():
    # with viscosity, the acoustic pulse loses energy vs inviscid Euler
    def run(modname, extra, bcs):
        cfg = {
            "Mesh": {"dimension": 1, "element type": "interval", "NX": 32},
            "Physics": {"modules": modname, "gamma": 1.4, **extra, **bcs,
                        "Initial conditions": {
                            "rho": "1.0 + 0.01*exp(-200*(x-0.5)*(x-0.5))",
                            "rhoux": "0.0",
                            "rhoE":
                                "(1.0/0.4) + 0.01*exp(-200*(x-0.5)*(x-0.5))"}},
            "Discretization": {"order": {"rho": 1, "rhoux": 1, "rhoE": 1},
                               "quadrature": 2},
            "Solver": {"solver": "transient", "final time": 0.02,
                       "number of steps": 4,
                       "transient Butcher tableau": "DIRK-1,2",
                       "max nonlinear iters": 6},
            "Postprocess": {"compute errors": False},
        }
        p = Problem(cfg)
        u = np.asarray(p.run().u)
        mom = u[np.asarray(p.disc.dofmap.all_dofs("rhoux"))]
        return u, mom

    u_euler, mom_euler = run(
        "Euler", {"max EV stabilization": True},
        {"Slip conditions": {"rho": {"left": "0", "right": "0"}}})
    u_cns, mom_cns = run(
        "cns", {"mu": 0.05},
        {"Dirichlet conditions": {"scalar data": True,
                                  "rhoux": {"left": 0.0, "right": 0.0}}})
    assert np.isfinite(u_cns).all()
    # momentum magnitude damped by viscosity
    assert np.abs(mom_cns).max() < np.abs(mom_euler).max()

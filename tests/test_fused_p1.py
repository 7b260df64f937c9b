"""Generic fused p1 Pallas assembly (ops/fused_p1.py) vs the general
vmapped path: multi-variable (Navier-Stokes ux/uy/pr with PSPG/SUPG),
3D hex thermal, CDR, and transient seeding. Interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrhyde_tpu.assembly.assembler import TimeCoeffs
from mrhyde_tpu.ops.fused_p1 import FusedP1Assembly
from mrhyde_tpu.problem import Problem


def _compare(p, tc, tol=1e-11):
    asm = p.assembler
    fk = FusedP1Assembly.build(asm)
    assert fk is not None and fk.available(interpret=True)
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(p.n_dof) * 0.3)
    r_ref = asm.residual(u, tc, None)
    J_ref = asm.jacobian(u, tc, None)
    r_f, J_f = fk.res_jac_blocks(u, tc, None, interpret=True)
    assert float(jnp.max(jnp.abs(r_f - r_ref))) < tol
    assert float(jnp.max(jnp.abs(J_f - J_ref.vol))) < tol
    # SoA BlockJacobian (the production layout off the kernel):
    # aos/apply/diag must agree with the general AoS path
    _r2, J_soa = fk.jacobian(u, tc, None, interpret=True)
    assert J_soa.vol is None and J_soa.vol_soa is not None
    assert float(jnp.max(jnp.abs(J_soa.aos() - J_ref.vol))) < tol
    v = jnp.asarray(rng.randn(p.n_dof))
    assert float(jnp.max(jnp.abs(J_soa.apply(v) - J_ref.apply(v)))) \
        < tol * 10
    assert float(jnp.max(jnp.abs(J_soa.diag() - J_ref.diag()))) < tol
    av = asm.matfree_apply_fn(J_soa)(v)
    assert float(jnp.max(jnp.abs(av - J_ref.apply(v)))) < tol * 10


@pytest.mark.slow
def test_thermal_2d_nondivisible_dims_matches_general():
    """Mesh dims that do NOT divide the tile: the kernel pads the
    element grid to tile multiples and discards pad-element output."""
    p = Problem({
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 6, "NY": 5},
        "Functions": {"thermal source": "sin(2*pi*x)*sin(2*pi*y)",
                      "thermal diffusion": "1.0 + 0.5*x*y"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
    })
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    _compare(p, tc)


@pytest.mark.slow
def test_thermal_2d_matches_general():
    p = Problem({
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 4, "NY": 4},
        "Functions": {"thermal source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)",
                      "thermal diffusion": "1.0 + 0.5*x*y"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
    })
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    _compare(p, tc)


@pytest.mark.slow
def test_thermal_3d_hex_matches_general():
    p = Problem({
        "Mesh": {"dimension": 3, "element type": "hex",
                 "NX": 4, "NY": 4, "NZ": 4},
        "Functions": {"thermal source": "sin(pi*x)*sin(pi*y)*sin(pi*z)"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
    })
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    _compare(p, tc)


@pytest.mark.slow
def test_ns_pspg_multivariable_matches_general():
    p = Problem({
        "Mesh": {"dimension": 2, "element type": "quad",
                 "xmin": 0.0, "xmax": 5.0, "ymin": 0.0, "ymax": 1.0,
                 "NX": 4, "NY": 4},
        "Physics": {"modules": "navier stokes", "usePSPG": True,
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "ux": {"bottom": 0.0, "top": 0.0},
                        "uy": {"bottom": 0.0, "top": 0.0}}},
        "Functions": {"source ux": "1.0", "viscosity": "0.1"},
        "Discretization": {"order": {"ux": 1, "uy": 1, "pr": 1},
                           "quadrature": 2},
        "Solver": {"solver": "steady-state"},
    })
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    _compare(p, tc, tol=1e-10)


@pytest.mark.slow
def test_ns_supg_transient_matches_general():
    p = Problem({
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 4, "NY": 4},
        "Physics": {"modules": "navier stokes", "usePSPG": True,
                    "useSUPG": True,
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "ux": {"bottom": 0.0, "top": 1.0}}},
        "Functions": {"viscosity": "0.05"},
        "Discretization": {"order": {"ux": 1, "uy": 1, "pr": 1},
                           "quadrature": 2},
        "Solver": {"solver": "transient", "delta t": 0.1},
    })
    p.assembler.is_transient = True
    rng = np.random.RandomState(5)
    dt = jnp.asarray(0.1)
    bu = jnp.asarray(rng.randn(p.n_dof) * 0.05)
    bt = jnp.asarray(rng.randn(p.n_dof) * 0.05)
    tc = TimeCoeffs(jnp.asarray(1.0), bu, jnp.asarray(10.0), bt,
                    jnp.asarray(0.2), dt)
    _compare(p, tc, tol=1e-10)


def test_cdr_matches_general():
    p = Problem({
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 4, "NY": 4},
        "Functions": {"source": "sin(pi*x)", "xvel": "1.0", "yvel": "0.5",
                      "diffusion": "0.1"},
        "Physics": {"modules": "cdr",
                    "Dirichlet conditions": {"c": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"c": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
    })
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    _compare(p, tc)


def test_fused_composes_with_boundary_groups():
    """Active boundary groups (a Neumann flux here) no longer
    disqualify the fused volume kernel: Assembler.res_and_jac attaches
    the general-path boundary contributions to the fused result and
    must match the fully-general residual/jacobian."""
    p = Problem({
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 5, "NY": 4},
        "Functions": {"thermal source": "sin(pi*x)*y",
                      "thermal diffusion": "1.0 + 0.5*x"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "e": {"left": 0.0, "bottom": 0.0}},
                    "Neumann conditions": {
                        "e": {"right": "2.0 + y", "top": "x"}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
    })
    asm = p.assembler
    assert asm._active_bnd_groups(), "deck must exercise boundary asm"
    fk = FusedP1Assembly.build(asm)
    assert fk is not None
    asm.__dict__["_fused_cache"] = (fk, True)     # force interpret mode
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    rng = np.random.RandomState(3)
    u = jnp.asarray(rng.randn(p.n_dof) * 0.3)
    r_f, J_f = asm.res_and_jac(u, tc, None)
    assert asm.fused_active and J_f.vol is None and J_f.bnd
    r_ref = asm.residual(u, tc, None)
    J_ref = asm.jacobian(u, tc, None)
    assert float(jnp.max(jnp.abs(r_f - r_ref))) < 1e-11
    v = jnp.asarray(rng.randn(p.n_dof))
    assert float(jnp.max(jnp.abs(J_f.apply(v) - J_ref.apply(v)))) \
        < 1e-10
    assert float(jnp.max(jnp.abs(J_f.diag() - J_ref.diag()))) < 1e-11
    av = asm.matfree_apply_fn(J_f)(v)
    assert float(jnp.max(jnp.abs(av - J_ref.apply(v)))) < 1e-10


@pytest.mark.slow
def test_thermal_p2_matches_general():
    """p2 HGRAD through the parity-class fused path
    (docs/DESIGN_fused_p2.md): nonlinear + spatially varying
    diffusion, non-divisible dims, full 9x9 element Jacobians. The
    reference's hot loop serves every basis through one optimized path
    (assemblyManager.cpp:2356 + buildDatabase :4249)."""
    p = Problem({
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 6, "NY": 5},
        "Functions": {"thermal source": "sin(2*pi*x)*sin(2*pi*y)",
                      "thermal diffusion": "1.0 + 0.5*x*y + e*e"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 2}, "quadrature": 4},
        "Solver": {"solver": "steady-state"},
    })
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    _compare(p, tc, tol=1e-10)


@pytest.mark.slow
def test_ns_p2_transient_multivariable_matches_general():
    """Equal-order p2 NS (PSPG+SUPG) with transient seeding: 3 vars x
    9 lattice dofs (nd=27) through the class-grid gather and the
    27x27 Jacobian row machinery."""
    p = Problem({
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 2, "NY": 2},
        "Physics": {"modules": "navier stokes", "usePSPG": True,
                    "useSUPG": True,
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "ux": {"bottom": 0.0, "top": 1.0}}},
        "Functions": {"viscosity": "0.05"},
        "Discretization": {"order": {"ux": 2, "uy": 2, "pr": 2},
                           "quadrature": 2},
        "Solver": {"solver": "transient", "delta t": 0.1},
    })
    p.assembler.is_transient = True
    rng = np.random.RandomState(5)
    dt = jnp.asarray(0.1)
    bu = jnp.asarray(rng.randn(p.n_dof) * 0.05)
    bt = jnp.asarray(rng.randn(p.n_dof) * 0.05)
    tc = TimeCoeffs(jnp.asarray(1.0), bu, jnp.asarray(10.0), bt,
                    jnp.asarray(0.2), dt)
    _compare(p, tc, tol=1e-10)


@pytest.mark.slow
def test_thermal_p2_forward_solve_matches_general():
    """End-to-end p2 Newton solve through Assembler.res_and_jac with
    the fused path forced on (interpret): same solution as the
    general path, and the fused path must actually engage."""
    import os
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 5, "NY": 4},
        "Functions": {"thermal source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)",
                      "thermal diffusion": "1.0 + e*e"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 2}, "quadrature": 4},
        "Solver": {"solver": "steady-state", "max nonlinear iters": 10},
    }
    p0 = Problem(cfg)
    u0 = p0.forward().u
    p1 = Problem(cfg)
    fk = FusedP1Assembly.build(p1.assembler)
    assert fk is not None and fk.p == 2
    p1.assembler.__dict__["_fused_cache"] = (fk, True)
    u1 = p1.forward().u
    assert p1.assembler.fused_active
    assert float(jnp.max(jnp.abs(u1 - u0))) < 1e-9

"""Fused Pallas assembly kernel vs the general vmapped path.

The kernel (mrhyde_tpu/ops/fused_assembly.py) must reproduce the
general gather->jacfwd->scatter assembly digit-for-digit on its
supported configuration (structured uniform quad, p1 HGRAD thermal).
Runs in Pallas interpret mode on the CPU test backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrhyde_tpu.problem import Problem
from mrhyde_tpu.assembly.assembler import TimeCoeffs
from mrhyde_tpu.ops.fused_assembly import FusedThermalAssembly


def _problem(extra_funcs=None, phys_extra=None):
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 16, "NY": 16},
        "Functions": {"thermal source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)",
                      **(extra_funcs or {})},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions":
                    {"e": {"all boundaries": 0.0}},
                    **(phys_extra or {})},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
        "Postprocess": {},
    }
    return Problem(cfg)


def _compare(p, tc):
    asm = p.assembler
    fk = FusedThermalAssembly.build(asm)
    assert fk is not None and fk.available(interpret=True)
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(p.n_dof))
    r_ref = asm.residual(u, tc, None)
    J_ref = asm.jacobian(u, tc, None).vol
    r_f, J_f = fk.res_jac_blocks(u, tc, None, interpret=True)
    assert float(jnp.max(jnp.abs(r_f - r_ref))) < 1e-12
    assert float(jnp.max(jnp.abs(J_f - J_ref))) < 1e-12


@pytest.mark.slow
def test_steady_variable_kappa():
    p = _problem({"thermal diffusion": "1.0 + 0.5*x*y"})
    _compare(p, TimeCoeffs.steady(p.n_dof, dtype=jnp.float64))


def test_transient_seeded():
    p = _problem()
    rng = np.random.RandomState(1)
    n = p.n_dof
    tc = TimeCoeffs(jnp.asarray(0.7), jnp.asarray(rng.randn(n)),
                    jnp.asarray(3.1), jnp.asarray(rng.randn(n)),
                    jnp.asarray(0.3), jnp.asarray(0.05))
    _compare(p, tc)


@pytest.mark.slow
def test_advection():
    p = _problem({"advection x": "1.0 + y", "advection y": "0.5*x"},
                 {"include advection": True})
    if not getattr(p.assembler.modules[0], "have_advection", False):
        pytest.skip("thermal advection flag not enabled by deck key")
    _compare(p, TimeCoeffs.steady(p.n_dof, dtype=jnp.float64))


def test_build_rejects_unsupported():
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 8, "NY": 8},
        "Functions": {},
        "Physics": {"modules": "cdr",
                    "Dirichlet conditions":
                    {"c": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"c": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
        "Postprocess": {},
    }
    p = Problem(cfg)
    assert FusedThermalAssembly.build(p.assembler) is None

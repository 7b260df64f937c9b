"""Distribution v2: DOF-sharded assembly + halo exchange parity.

The sharded residual/Newton step must match the single-device assembler
to ~1e-10 on a mesh whose DOF vector exceeds one shard's slice (every
shard holds only ~n_dof/S owned dofs — the scale-out contract of the
reference's owned/overlapped maps, linearAlgebraInterface.cpp:145-309).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mrhyde_tpu.assembly.assembler import TimeCoeffs
from mrhyde_tpu.parallel.dof_sharding import (DofShardedStep,
                                              build_dof_partition)
from mrhyde_tpu.problem import Problem


def _mesh(n=8):
    devs = jax.devices("cpu")[:n]
    return Mesh(np.array(devs), ("dp",))


def _thermal(nx=32, ny=32):
    return Problem({
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": nx, "NY": ny},
        "Functions": {"thermal source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
    })


def test_partition_covers_and_balances():
    p = _thermal(16, 16)
    part = build_dof_partition(p.assembler, 8)
    alld = np.sort(np.concatenate(part.owned))
    assert np.array_equal(alld, np.arange(p.n_dof))
    # every shard owns strictly less than the whole vector (scale-out)
    assert all(len(o) < p.n_dof for o in part.owned)
    assert part.nmax <= -(-p.n_dof // 8) + 40   # near-even split


@pytest.mark.slow
def test_sharded_residual_matches_single_device():
    p = _thermal()
    mesh = _mesh()
    step = DofShardedStep(p.assembler, mesh)
    part = step.part

    rng = np.random.RandomState(3)
    u = rng.randn(p.n_dof)
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    r_ref = np.asarray(p.assembler.residual(jnp.asarray(u), tc, None))

    u_sh = part.to_sharded(u, mesh)
    z_sh = part.to_sharded(np.zeros(p.n_dof), mesh)
    r_sh = step.residual_fn()(u_sh, z_sh, z_sh, tc)
    r = part.from_sharded(r_sh)
    assert np.max(np.abs(r - r_ref)) < 1e-10 * (1 + np.abs(r_ref).max())


def test_sharded_newton_cg_step_matches_replicated():
    """One implicit Newton-CG step under DOF sharding == the same step
    with a replicated DOF vector (parallel/sharding.py)."""
    p = _thermal()
    mesh = _mesh()
    step = DofShardedStep(p.assembler, mesh, cg_iters=30)
    part = step.part
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)

    u0 = np.zeros(p.n_dof)
    u_sh = part.to_sharded(u0, mesh)
    z_sh = part.to_sharded(np.zeros(p.n_dof), mesh)
    u1_sh, rnorm = step.newton_cg_step_fn()(u_sh, z_sh, z_sh, tc)
    u1 = part.from_sharded(u1_sh)

    from mrhyde_tpu.parallel.sharding import sharded_newton_cg_step
    rep_step, _ = sharded_newton_cg_step(p.assembler, mesh, cg_iters=30)
    u1_rep, rnorm_rep = rep_step(jnp.asarray(u0), tc, None)
    assert np.isclose(float(rnorm), float(rnorm_rep), rtol=1e-12)
    assert np.max(np.abs(u1 - np.asarray(u1_rep))) < 1e-10


@pytest.mark.slow
def test_sharded_transient_residual_with_beta():
    """Transient coefficients flow through the sharded bu/bt path."""
    p = _thermal(16, 16)
    mesh = _mesh(4)
    step = DofShardedStep(p.assembler, mesh)
    part = step.part
    rng = np.random.RandomState(7)
    u = rng.randn(p.n_dof)
    bu = rng.randn(p.n_dof) * 0.1
    bt = rng.randn(p.n_dof) * 0.1
    dt = jnp.asarray(0.05)
    tc = TimeCoeffs(jnp.asarray(1.0), jnp.asarray(bu), jnp.asarray(20.0),
                    jnp.asarray(bt), jnp.asarray(0.3), dt)
    r_ref = np.asarray(p.assembler.residual(jnp.asarray(u), tc, None))
    r_sh = step.residual_fn()(part.to_sharded(u, mesh),
                              part.to_sharded(bu, mesh),
                              part.to_sharded(bt, mesh), tc)
    r = part.from_sharded(r_sh)
    assert np.max(np.abs(r - r_ref)) < 1e-10 * (1 + np.abs(r_ref).max())


@pytest.mark.slow
def test_mixing_channel_under_dof_sharding():
    """tet HCURL order >= 2: the 2x2 face-pair orientation mixing
    channel (fem/dofmap mix_pair/mix_w) ships per shard — sharded
    residual and Newton-CG step match the single-device assembler."""
    cfg = {
        "Mesh": {"dimension": 3, "element type": "tet",
                 "NX": 4, "NY": 2, "NZ": 2},
        "Physics": {"modules": "maxwell",
                    "Initial conditions": {
                        f"{v}[{c}]": "0.0"
                        for v in ("E", "B") for c in "xyz"}},
        "Functions": {"current x": "1.0", "permittivity": "1.0",
                      "permeability": "1.0"},
        "Discretization": {"order": {"E": 2, "B": 1}, "quadrature": 4},
        "Solver": {"solver": "transient", "final time": 0.01,
                   "number of steps": 1},
    }
    p = Problem(cfg)
    assert p.assembler.mixp is not None   # the channel is exercised
    mesh = _mesh(2)
    step = DofShardedStep(p.assembler, mesh, cg_iters=40)
    part = step.part
    rng = np.random.RandomState(5)
    u = rng.randn(p.n_dof)
    bu = rng.randn(p.n_dof) * 0.1
    bt = rng.randn(p.n_dof) * 0.1
    tc = TimeCoeffs(jnp.asarray(1.0), jnp.asarray(bu), jnp.asarray(50.0),
                    jnp.asarray(bt), jnp.asarray(0.005),
                    jnp.asarray(0.01))
    r_ref = np.asarray(p.assembler.residual(jnp.asarray(u), tc, None))
    u_sh = part.to_sharded(u, mesh)
    bu_sh = part.to_sharded(bu, mesh)
    bt_sh = part.to_sharded(bt, mesh)
    r = part.from_sharded(step.residual_fn()(u_sh, bu_sh, bt_sh, tc))
    assert np.max(np.abs(r - r_ref)) < 1e-9 * (1 + np.abs(r_ref).max())

    # Jacobian fold W^T J W parity through one Newton-CG step: compare
    # against the replicated scheme on the same operator
    u1_sh, rnorm = step.newton_cg_step_fn()(u_sh, bu_sh, bt_sh, tc)
    from mrhyde_tpu.parallel.sharding import sharded_newton_cg_step
    rep_step, _ = sharded_newton_cg_step(p.assembler, mesh, cg_iters=40)
    u1_rep, rnorm_rep = rep_step(jnp.asarray(u), tc, None)
    assert np.isclose(float(rnorm), float(rnorm_rep), rtol=1e-10)
    assert np.max(np.abs(part.from_sharded(u1_sh) - np.asarray(u1_rep))) \
        < 1e-9 * (1 + np.abs(np.asarray(u1_rep)).max())


@pytest.mark.slow
def test_multiscale_fine_solves_sharded():
    """Multiscale two-level parallelism over devices (the reference's
    'multiscale split comm', split_mpi_communicators.cpp:31-41): the
    vmapped subgrid DtN fine solves run sharded over the 'dp' axis via
    SubgridDtN.enable_device_sharding, and the v1 replicated Newton-CG
    step with upscaled subgrid residual/Jacobian blocks matches the
    1-device run exactly."""
    from tests.test_multiscale import CFG
    from mrhyde_tpu.parallel.sharding import sharded_newton_cg_step

    p = Problem(CFG)
    assert p.assembler.multiscale is not None
    rng = np.random.RandomState(13)
    u = rng.randn(p.n_dof) * 0.1
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    r_ref = np.asarray(p.assembler.residual(jnp.asarray(u), tc, None))

    mesh8 = _mesh(8)
    step8, _ = sharded_newton_cg_step(p.assembler, mesh8, cg_iters=30)
    u8, rn8 = step8(jnp.asarray(u), tc, None)
    u8 = np.asarray(u8)
    # the sharded residual norm equals the assembler's
    assert np.isclose(float(rn8), float(np.linalg.norm(r_ref)),
                      rtol=1e-12)

    mesh1 = Mesh(np.array(jax.devices("cpu")[:1]), ("dp",))
    step1, _ = sharded_newton_cg_step(p.assembler, mesh1, cg_iters=30)
    u1, rn1 = step1(jnp.asarray(u), tc, None)
    assert np.isclose(float(rn8), float(rn1), rtol=1e-12)
    assert np.max(np.abs(u8 - np.asarray(u1))) \
        < 1e-10 * (1 + np.abs(np.asarray(u1)).max())


@pytest.mark.slow
def test_signed_spaces_under_dof_sharding():
    """HDIV/HCURL orientation signs survive the owned/ghost gather."""
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 12, "NY": 12},
        "Physics": {"modules": "porous mixed",
                    "Dirichlet conditions": {"p": {"all boundaries": "0.0"}}},
        "Functions": {"source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Solver": {"solver": "steady-state", "initial type": "none"},
        "Discretization": {"order": {"p": 0, "u": 1}, "quadrature": 2},
    }
    p = Problem(cfg)
    mesh = _mesh(4)
    step = DofShardedStep(p.assembler, mesh)
    part = step.part
    rng = np.random.RandomState(11)
    u = rng.randn(p.n_dof)
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    r_ref = np.asarray(p.assembler.residual(jnp.asarray(u), tc, None))
    z = part.to_sharded(np.zeros(p.n_dof), mesh)
    r = part.from_sharded(
        step.residual_fn()(part.to_sharded(u, mesh), z, z, tc))
    assert np.max(np.abs(r - r_ref)) < 1e-9 * (1 + np.abs(r_ref).max())

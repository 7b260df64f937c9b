"""Deck-level DOF-sharded execution (parallel/deck_sharded.py):
`Solver: shards: N` runs the standard forward path — transient,
GMRES/CG, field params, per-block physics — through the SPMD
shard_map programs, and the error norms must match the unsharded
solve to f64 solver precision (the reference's `mpiexec -n 1` vs
`-n 4` invariance; every regression gold was generated at -n 4)."""

import copy

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


def _norms(cfg, shards):
    cfg = copy.deepcopy(cfg)
    if shards:
        cfg.setdefault("Solver", {})["shards"] = shards
    res = Problem(cfg).run()
    out = {}
    for (t, errs) in res.error_history:
        for k, v in errs.items():
            out[(round(float(t), 10),) + k] = float(v)
    assert out, "deck produced no error norms"
    return out


def _assert_match(cfg, shards=8, tol=1e-10):
    a = _norms(cfg, 0)
    b = _norms(cfg, shards)
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=tol, abs=1e-14), \
            (k, a[k], b[k])


_THERMAL = {
    "Mesh": {"dimension": 2, "element type": "quad",
             "NX": 12, "NY": 12},
    "Functions": {"thermal source":
                  "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
    "Physics": {"modules": "thermal",
                "Dirichlet conditions": {"e": {"all boundaries": 0.0}}},
    "Discretization": {"order": {"e": 1}, "quadrature": 2},
    "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-12},
    "Postprocess": {"compute errors": True,
                    "True solutions": {"e": "sin(2*pi*x)*sin(2*pi*y)"}},
}


@pytest.mark.slow
def test_thermal_steady_sharded_matches():
    _assert_match(_THERMAL)


@pytest.mark.slow
def test_thermal_transient_sharded_matches():
    cfg = copy.deepcopy(_THERMAL)
    cfg["Physics"]["Initial conditions"] = {"scalar data": True,
                                            "e": 0.0}
    cfg["Solver"] = {"solver": "transient",
                     "transient Butcher tableau": "DIRK-2,2",
                     "transient BDF order": 1,
                     "final time": 0.05, "number of steps": 3,
                     "nonlinear TOL": 1e-12}
    cfg["Postprocess"]["True solutions"] = {
        "e": "(1.0-exp(-8.0*pi*pi*t))*sin(2*pi*x)*sin(2*pi*y)"}
    _assert_match(cfg)


@pytest.mark.slow
def test_ns_channel_sharded_matches():
    """Nonsymmetric system -> the sharded GMRES path."""
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "xmin": 0.0, "xmax": 2.0, "ymin": 0.0, "ymax": 1.0,
                 "NX": 16, "NY": 8},
        "Physics": {"modules": "navier stokes", "usePSPG": True,
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "ux": {"bottom": 0.0, "top": 0.0},
                        "uy": {"bottom": 0.0, "top": 0.0}}},
        "Discretization": {"order": {"ux": 1, "uy": 1, "pr": 1},
                           "quadrature": 2},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-10},
        "Functions": {"source ux": "1.0"},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "ux": "0.5*y*(1.0-y)", "uy": "0.0"}},
    }
    _assert_match(cfg, tol=1e-8)


@pytest.mark.slow
def test_per_block_physics_sharded_matches():
    """Per-block module masks ride the sharded extra channel (lifts
    the round-2 dof_sharding exclusion)."""
    from test_per_block_physics import _cfg
    _assert_match(_cfg(16))


@pytest.mark.slow
def test_multiscale_deck_sharded_matches_gold():
    """Multiscale decks run distributed too: `Solver: shards` routes
    them through the element-sharded scheme (replicated macro vector,
    device-sharded subgrid fine solves — ReplicatedShardedNewton).
    The 2D_verification_multiscale gold norms must reproduce at 8
    shards AND match the unsharded run to solver precision.
    (8 shards on the 4x4 macro mesh exceeds the DOF-sharded halo-ring
    neighbor limit, so this deck requests the replicated scheme
    explicitly — the DOF-sharded composition is covered below.)"""
    from test_multiscale import CFG
    cfg = copy.deepcopy(CFG)
    cfg.setdefault("Solver", {})["sharded scheme"] = "replicated"
    a = _norms(cfg, 0)
    b = _norms(cfg, 8)
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-9, abs=1e-13), \
            (k, a[k], b[k])
    # the reference gold values (mrhyde.gold) through the sharded path
    assert b[(0.0, "L2-face", "e")] == pytest.approx(0.198706, rel=1e-3)
    assert b[(0.0, "Subgrid-L2", "e")] == pytest.approx(0.042848,
                                                        rel=1e-3)


@pytest.mark.slow
def test_field_param_forward_sharded_matches():
    """Discretized field param in the forward solve under sharding
    (lifts the round-2 exclusion): same solution vector to 1e-10."""
    cfg = copy.deepcopy(_THERMAL)
    cfg["Functions"] = {"thermal source": "8*(pi*pi)*srcfield"}
    cfg["Parameters"] = {
        "srcfield": {"usage": "discretized", "basis": "HGRAD",
                     "order": 1, "value": 1.0}}
    del cfg["Postprocess"]

    import jax.numpy as jnp

    def solve(shards):
        c = copy.deepcopy(cfg)
        if shards:
            c["Solver"]["shards"] = shards
        p = Problem(c)
        n_p = p.assembler.field_params["srcfield"]["n_dof"]
        x = np.linspace(0.3, 1.7, n_p)
        res = p.forward(pvec={"srcfield": jnp.asarray(x)})
        return np.asarray(res.u)

    u0 = solve(0)
    u8 = solve(8)
    assert np.linalg.norm(u0) > 1e-3
    np.testing.assert_allclose(u8, u0, rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_field_param_boundary_group_sharded_matches():
    """Discretized field param evaluated on an ACTIVE BOUNDARY GROUP
    (a Neumann flux referencing the param at side qps) under DOF
    sharding — lifts the last v2 exclusion (round-4
    dof_sharding.py:219). The reference distributes discretized
    params through the same owned/overlapped maps as state everywhere
    (parameterManager.cpp:272; e.g. the Neumann 'xtrac*ny' traction in
    le/2d_sparse_simul_inversion)."""
    cfg = copy.deepcopy(_THERMAL)
    cfg["Functions"] = {"thermal source": "1.0 + x*y"}
    cfg["Physics"]["Dirichlet conditions"] = {
        "scalar data": True, "e": {"left": 0.0, "bottom": 0.0}}
    cfg["Physics"]["Neumann conditions"] = {
        "e": {"right": "2.0*bflux", "top": "bflux*bflux - y"}}
    cfg["Parameters"] = {
        "bflux": {"usage": "discretized", "basis": "HGRAD",
                  "order": 1, "value": 1.0}}
    del cfg["Postprocess"]

    import jax.numpy as jnp

    def solve(shards):
        c = copy.deepcopy(cfg)
        if shards:
            c["Solver"]["shards"] = shards
        p = Problem(c)
        assert p.assembler._active_bnd_groups(), \
            "deck must exercise boundary-group assembly"
        n_p = p.assembler.field_params["bflux"]["n_dof"]
        x = np.linspace(0.4, 1.6, n_p)
        res = p.forward(pvec={"bflux": jnp.asarray(x)})
        return np.asarray(res.u)

    u0 = solve(0)
    u8 = solve(8)
    assert np.linalg.norm(u0) > 1e-3
    np.testing.assert_allclose(u8, u0, rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_multiscale_deck_sharded_matches():
    """Multiscale (subgrid DtN2) under DOF sharding (VERDICT r3 item
    4): macro DOFs sharded with ppermute halo rings while the fine DtN
    solves assemble outside the shard_map — gold L2-face 0.198706
    (thermal/2D_verification_multiscale) reproduced through
    `Solver: shards: 4` with diff vs replicated at solver precision."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_multiscale import CFG
    cfg = copy.deepcopy(CFG)
    a = _norms(cfg, 0)
    b = _norms(cfg, 4)     # 4x4 macro mesh: one row per shard minimum
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-10, abs=1e-14), \
            (k, a[k], b[k])
    key = [k for k in b if k[1] == "L2-face"][0]
    assert b[key] == pytest.approx(0.198706, rel=1e-3)

"""Per-block physics assignment (reference: physicsInterface.cpp:38-54
— each element block owns its own module list; VERDICT round-1 missing
item 6): thermal on eblock-0_0 and CDR on eblock-1_0 of one two-block
mesh, solved together, per-block errors reported.

TPU design: ONE batched element array; each module's volume
contribution is scaled by a static (E,) block mask — branch-free
dispatch, no ragged per-block loops.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mrhyde_tpu.problem import Problem


def _cfg(nx):
    # [0,2]x[0,1] split at x=1: thermal (var e) on the left block,
    # CDR (var c) on the right block. Both manufactured so each var is
    # exact on ITS block: e = sin(pi x)sin(pi y) (zero at x=1),
    # c likewise shifted.
    return {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "xmin": 0.0, "xmax": 2.0, "ymin": 0.0, "ymax": 1.0,
                 "NX": nx, "NY": nx // 2, "Xblocks": 2},
        "Physics": {
            "eblock-0_0": {
                "modules": "thermal",
                "Dirichlet conditions": {
                    "e": {"all boundaries": 0.0},
                    "c": {"all boundaries": 0.0}}},
            "eblock-1_0": {"modules": "cdr"},
        },
        "Functions": {
            # each var satisfies a NATURAL (zero-flux) condition at the
            # block interface x=1 (the one-sided assembly imposes it):
            # e = sin(pi x/2) sin(pi y), c = cos(pi (x-1)/2) sin(pi y)
            "thermal source": "(5.0*pi*pi/4.0)*sin(pi*x/2)*sin(pi*y)"
                              "*(x<1.0)",
            "source": "(5.0*pi*pi/4.0)*cos(pi*(x-1.0)/2)*sin(pi*y)"
                      "*(x>1.0)",
            "diffusion": "1.0", "xvel": "0.0", "yvel": "0.0",
            "reaction": "0.0"},
        "Discretization": {"order": {"e": 1, "c": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-10,
                   "max nonlinear iters": 3, "use direct solver": True},
        "Postprocess": {"compute errors": True,
                        "True solutions": {
                            "e": "sin(pi*x/2)*sin(pi*y)*(x<1.0)",
                            "c": "cos(pi*(x-1.0)/2)*sin(pi*y)*(x>1.0)"}},
    }


@pytest.mark.slow
def test_two_block_thermal_cdr():
    p = Problem(_cfg(16))
    assert p.assembler.module_masks is not None
    assert p.assembler.module_masks.shape[1] == 2
    res = p.run()
    # per-block errors: (kind, var) is block 0, (kind@1, var) block 1
    e0 = res.errors[("L2", "e")]          # thermal error on its block
    c1 = res.errors[("L2@1", "c")]        # cdr error on its block
    assert e0 < 0.02
    assert c1 < 0.02
    # cross-block entries exist (per-block reporting) and are finite
    assert np.isfinite(res.errors[("L2@1", "e")])
    assert np.isfinite(res.errors[("L2", "c")])

    # convergence: halving h quarters the on-block errors
    res2 = Problem(_cfg(32)).run()
    assert res2.errors[("L2", "e")] < 0.3 * e0
    assert res2.errors[("L2@1", "c")] < 0.3 * c1


def test_masked_residual_is_blockwise():
    """The thermal module must contribute NOTHING on the CDR block."""
    from mrhyde_tpu.assembly.assembler import TimeCoeffs
    p = Problem(_cfg(8))
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(p.n_dof))
    r = np.asarray(p.assembler.residual(u, tc, None))
    # dofs of e strictly interior to block 1 (x > 1) see only the
    # (masked-out) thermal module -> zero residual rows
    dm = p.assembler.disc.dofmap
    i_e = dm.var_index("e")
    coords = dm.vars[i_e].dof_coords
    interior_b1 = np.where(coords[:, 0] > 1.0 + 1e-9)[0]
    rows = int(dm.var_start[i_e]) + interior_b1
    assert np.abs(r[rows]).max() < 1e-12


@pytest.mark.slow
def test_per_block_with_boundary_groups():
    """Per-block physics WITH active boundary groups (round-2 missing
    item 5 — this used to raise NotImplementedError): thermal's top
    Neumann must be assembled ONLY on its own block's top elements.

    The manufactured e = sin(pi x/2) sin(pi y) needs flux
    g = -pi sin(pi x/2) on block 0's top; the deck's expression keeps
    that form over block 1 too (nonzero garbage there). Unmasked
    boundary assembly would attach those contributions to the top
    element at the block interface (shared e dofs at x=1) and pollute
    the block-0 solution; with per-block masking the error stays at
    the Dirichlet-deck level and converges at O(h^2).
    """
    def cfg(nx):
        c = _cfg(nx)
        # replace e's top Dirichlet with the exact Neumann flux
        # (du/dn at y=1: d/dy sin(pi y) = pi cos(pi) = -pi)
        c["Physics"]["eblock-0_0"]["Dirichlet conditions"]["e"] = {
            "left": 0.0, "right": 0.0, "bottom": 0.0}
        c["Physics"]["eblock-0_0"]["Neumann conditions"] = {
            "e": {"top": "pi*sin(pi*x/2)*cos(pi*1.0)"}}
        return c

    p = Problem(cfg(16))
    assert p.assembler.module_masks is not None
    assert p.assembler._active_bnd_groups()
    res = p.run()
    e0 = res.errors[("L2", "e")]
    c1 = res.errors[("L2@1", "c")]
    assert e0 < 0.03, e0
    assert c1 < 0.02, c1
    res2 = Problem(cfg(32)).run()
    assert res2.errors[("L2", "e")] < 0.3 * e0

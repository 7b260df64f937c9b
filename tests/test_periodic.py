"""Periodic BCs: cdr/periodic regression parity (advected bubble on a
periodic strip; gold values from the reference's mrhyde.gold)."""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem

CFG = {
    "Mesh": {"dimension": 2, "element type": "quad", "NX": 40, "NY": 40,
             "Periodic BCs": {"Count": 1,
                              "Periodic Condition 1":
                                  "y-all 1e-8: left;right"}},
    "Functions": {"source": "0.0", "diffusion": "0.5", "xvel": "10.0",
                  "yvel": "0.0", "reaction": "0.0", "SUPG tau": "0.0",
                  "bubble": "-25.0*(x-0.7)*(x-0.7) - 25.0*(y-0.5)*(y-0.5)"},
    "Physics": {"modules": "cdr", "Initial conditions": {"c": "exp(bubble)"}},
    "Discretization": {"order": {"c": 1}, "quadrature": 2},
    "Solver": {"solver": "transient", "nonlinear TOL": 1e-7,
               "max nonlinear iters": 10, "final time": 1.0,
               "delta t": 0.1},
    "Postprocess": {"compute errors": True, "True solutions": {"c": "0.0"}},
}


@pytest.mark.slow
def test_cdr_periodic_matches_gold():
    res = Problem(CFG).run()
    hist = {round(t, 10): e[("L2", "c")] for t, e in res.error_history}
    assert np.isclose(hist[0.0], 0.250474, rtol=2e-5)
    assert np.isclose(hist[0.1], 0.131765, rtol=2e-5)
    assert np.isclose(hist[1.0], 0.123484, rtol=2e-5)


def test_periodic_3d_hex_thermal():
    """3D periodic identification (front/back pair on a hex box): a
    z-independent manufactured solution solves to the expected 2D
    p1 accuracy with z-translation invariance enforced by the
    periodic dof identification."""
    import numpy as np
    from mrhyde_tpu.problem import Problem
    cfg = {
        "Mesh": {"dimension": 3, "element type": "hex",
                 "NX": 8, "NY": 8, "NZ": 4,
                 "Periodic BCs": {"Count": 1,
                                  "Periodic Condition 1":
                                  "xy-all 1e-8: front;back"}},
        "Functions": {"thermal source":
                      "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"left": "0.0",
                                                   "right": "0.0",
                                                   "top": "0.0",
                                                   "bottom": "0.0"}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "max nonlinear iters": 2},
        "Postprocess": {"compute errors": True,
                        "True solutions":
                        {"e": "sin(2*pi*x)*sin(2*pi*y)"}},
    }
    res = Problem(cfg).run()
    assert np.isclose(res.errors[("L2", "e")], 0.0255247, rtol=1e-3)


def test_periodic_edge_dofs_hcurl():
    """Edge/face dof numbering flows through the periodic node
    identification (_dof_conn), so HCURL/HDIV spaces on periodic
    meshes share seam dofs: a 4x4 quad with left/right identified has
    40 - 4 = 36 unique edges."""
    from mrhyde_tpu.mesh.structured import box_mesh, apply_periodic
    from mrhyde_tpu.fem.dofmap import _edge_numbering, build_dofmap
    m = apply_periodic(box_mesh("quad", nx=4, ny=4),
                       ["y-all 1e-8: left;right"])
    n_e, _ee, _fl, _ = _edge_numbering(m)
    assert n_e == 36
    dm = build_dofmap(m, [("E", "HCURL", 1), ("B", "HVOL", 0)])
    assert dm.vars[0].n_dof == 36
    assert dm.vars[1].n_dof == 16


def test_periodic_edge_no_aliasing_two_cells():
    """Two-cell-wide periodic directions must NOT alias distinct
    edges that share identified endpoints: a 2x2x2 hex torus (x and y
    periodic) keeps both x-edges per row distinct, so a constant
    current produces a nonzero HCURL load vector."""
    import jax.numpy as jnp
    import numpy as np
    from mrhyde_tpu.problem import Problem
    from mrhyde_tpu.assembly.assembler import TimeCoeffs
    cfg = {
        "Mesh": {"dimension": 3, "element type": "hex",
                 "NX": 2, "NY": 2, "NZ": 2,
                 "Periodic BCs": {"Count": 2,
                                  "Periodic Condition 1":
                                  "xz-all 1e-8: top;bottom",
                                  "Periodic Condition 2":
                                  "yz-all 1e-8: left;right"}},
        "Functions": {"current x": "1.0"},
        "Physics": {"modules": "maxwell"},
        "Discretization": {"order": {"E": 1, "B": 1}, "quadrature": 2},
        "Solver": {"solver": "transient", "final time": 1e-2,
                   "number of steps": 2},
        "Postprocess": {},
    }
    p = Problem(cfg)
    u = jnp.zeros(p.n_dof)
    tc = TimeCoeffs(jnp.asarray(1.0), u * 0, jnp.asarray(100.0), u * 0,
                    jnp.asarray(0.5), jnp.asarray(1e-2))
    r = p.assembler.residual(u, tc, None)
    # 32 distinct edges (HCURL E) + 28 distinct faces (HDIV B): the
    # 2-cell-wide periodic directions must not alias faces either
    # (x-normal 2*2*2 + y-normal 2*2*2 + z-normal 2*2*3 = 28)
    assert p.n_dof == 60
    assert float(jnp.linalg.norm(r)) > 0.1

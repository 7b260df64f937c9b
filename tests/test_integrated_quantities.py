"""Integrated quantities (reference: thermal/2D_integrated_quantities;
whole-domain values = 4x the reference's per-block golds:
total e = 4*0.101321, left flux = 2*(-1.00205))."""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem

CFG = {
    "Mesh": {"dimension": 2, "element type": "quad", "NX": 10, "NY": 10,
             "Xblocks": 2, "Yblocks": 2},
    "Functions": {"thermal source": "2*(pi*pi)*sin(pi*x)*sin(pi*y)"},
    "Physics": {"modules": "thermal",
                "test integrated quantities": True,
                "Dirichlet conditions": {"scalar data": True,
                                         "e": {"all boundaries": 0.0}}},
    "Discretization": {"order": {"e": 2}, "quadrature": 2},
    "Solver": {"solver": "steady-state", "max nonlinear iters": 2},
    "Postprocess": {
        "compute integrated quantities": True,
        "compute errors": True,
        "True solutions": {"e": "sin(pi*x)*sin(pi*y)"},
        "Integrated quantities": {
            "vol": {"integrand": "1."},
            "total e": {"integrand": "e", "location": "volume"},
            "bnd": {"integrand": "1.", "location": "boundary"},
            "left": {"integrand": "n[x]*grad(e)[x] + n[y]*grad(e)[y]",
                     "location": "boundary", "boundary names": "left"},
        },
    },
}


@pytest.mark.slow
def test_integrated_quantities():
    # gold (thermal/2D_integrated_quantities) reports per block on a
    # 2x2-block mesh: whole-domain totals are 4x (or 2x for the
    # half-side 'left' flux), and the global L2 error is 2x the
    # per-block value by symmetry
    res = Problem(CFG).run()
    iq = res.integrated
    assert np.isclose(iq["vol"], 1.0, rtol=1e-12)
    assert np.isclose(iq["bnd"], 4.0, rtol=1e-12)
    assert np.isclose(iq["total e"], 4 * 0.101321, rtol=1e-5)
    assert np.isclose(iq["left"], 2 * -1.00205, rtol=1e-5)
    assert np.isclose(iq["thermal vol total e"], 4 * 0.101321, rtol=1e-5)
    # per-block reporting now matches the reference gold directly
    # (the gold prints one line per element block)
    assert np.isclose(res.errors[("L2", "e")], 1.09691e-05, rtol=2e-5)
    for key in [k for k in res.errors if k[0].startswith("L2@")]:
        assert np.isclose(res.errors[key], 1.09691e-05, rtol=2e-5)

"""Multi-set physics: ODE + CDR with different per-set time schemes.

Mirrors regression/Multiphysics/MultiSet_different_timescheme (internal
mesh instead of the two-block Exodus file): q' = -q via BDF3 (+RK-4,4
startup), while CDR with unit reaction drives c from 0 to -t, so the
gold c error equals t exactly.
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import make_problem

CFG = {
    "Mesh": {"dimension": 2, "element type": "quad", "NX": 3, "NY": 3},
    "Functions": {"ODE source": "-1.0*q"},
    "Physics": {
        "physics set names": "ODE, CDR",
        "ODE": {"modules": "ODE",
                "Initial conditions": {"scalar data": True, "q": 1.0}},
        "CDR": {"modules": "cdr"},
    },
    "Discretization": {
        "ODE": {"order": {"q": 1}, "quadrature": 2},
        "CDR": {"order": {"c": 1}, "quadrature": 2},
    },
    "Solver": {
        "solver": "transient", "transient BDF order": 1,
        "transient Butcher tableau": "BWE", "nonlinear TOL": 1e-7,
        "max nonlinear iters": 2, "final time": 0.01,
        "number of steps": 8, "use direct solver": True,
        "ODE": {"transient Butcher tableau": "BWE",
                "transient BDF order": 3,
                "transient startup BDF order": 1,
                "transient startup Butcher tableau": "RK-4,4",
                "transient startup steps": 5},
        "CDR": {"transient Butcher tableau": "RK-4,4"},
    },
    "Analysis": {"analysis type": "forward"},
    "Postprocess": {"compute errors": True,
                    "True solutions": {"q": "1.0*exp(-1.0*t)",
                                       "c": "0.0"}},
}


@pytest.mark.slow
def test_multiset_different_timeschemes():
    res = make_problem(CFG).run()
    hist = {round(t, 10): e for t, e in res.error_history}
    # c integrates dc/dt = -1 exactly with RK-4,4: error = t
    # (gold: regression/Multiphysics/MultiSet_different_timescheme)
    assert np.isclose(hist[0.01][("L2", "c")], 0.01, rtol=1e-6)
    assert np.isclose(hist[0.005][("L2", "c")], 0.005, rtol=1e-6)
    # q: RK-4,4 startup then BDF3 (gold 1.48437e-12 at t=0.01)
    assert hist[0.01][("L2", "q")] < 5e-12


@pytest.mark.slow
def test_ns_cdr_fully_coupled_gold():
    """Multiphysics/NavierStokes-CDR/Fully-Coupled: one physics set,
    two modules, cross-variable expressions (cdr advected by ux/uy,
    NS forced by 0.1*c^2)."""
    import yaml
    d = ("/root/reference/regression/Multiphysics/NavierStokes-CDR/"
         "Fully-Coupled")
    mc = yaml.safe_load(open(f"{d}/input.yaml"))["ANONYMOUS"]
    cfg = {k: mc[k] for k in ("Mesh", "Physics", "Discretization",
                              "Solver", "Postprocess", "Functions")}
    res = make_problem(cfg).run()
    errs = res.errors if hasattr(res, "errors") else \
        res.error_history[-1][1]
    assert np.isclose(errs[("L2", "ux")], 0.00376827, rtol=1e-4)
    assert np.isclose(errs[("L2", "uy")], 0.00261266, rtol=1e-4)
    assert np.isclose(errs[("L2", "pr")], 0.118585, rtol=1e-4)
    assert np.isclose(errs[("L2", "c")], 2.053, rtol=1e-4)


@pytest.mark.slow
def test_ns_cdr_iteratively_coupled_gold():
    """Multiphysics/NavierStokes-CDR/Iteratively-Coupled: two physics
    sets Picard-swept with 'max subcycles: 2', each seeing the other's
    latest solution as a frozen field."""
    import yaml
    d = ("/root/reference/regression/Multiphysics/NavierStokes-CDR/"
         "Iteratively-Coupled")
    mc = yaml.safe_load(open(f"{d}/input.yaml"))["ANONYMOUS"]
    cfg = {k: mc[k] for k in ("Mesh", "Physics", "Discretization",
                              "Solver", "Postprocess", "Functions")}
    res = make_problem(cfg).run()
    errs = res.error_history[-1][1]
    assert np.isclose(errs[("L2", "ux")], 0.00376982, rtol=1e-4)
    assert np.isclose(errs[("L2", "uy")], 0.00261389, rtol=1e-4)
    assert np.isclose(errs[("L2", "pr")], 0.118639, rtol=1e-4)
    assert np.isclose(errs[("L2", "c")], 2.05308, rtol=1e-4)


@pytest.mark.slow
def test_multiset_multiblock_exodus_gold():
    """Multiphysics/MultiSet-MultiBlock: ODE + CDR sets on a two-block
    Exodus hex mesh; every error is reported once per element block
    (gold prints each line twice, both 1/sqrt(2) of the global norm)."""
    import yaml
    d = "/root/reference/regression/Multiphysics/MultiSet-MultiBlock"
    mc = yaml.safe_load(open(f"{d}/input.yaml"))["ANONYMOUS"]
    cfg = {k: mc[k] for k in ("Mesh", "Physics", "Discretization",
                              "Solver", "Postprocess", "Functions")}
    cfg["Mesh"] = dict(cfg["Mesh"])
    cfg["Mesh"]["mesh file"] = f"{d}/two_block_3D.e"
    res = make_problem(cfg).run()
    hist = {round(t, 10): e for t, e in res.error_history}
    for t, q, c in [(0.005, 1.23964e-05, 0.005),
                    (0.01, 2.46694e-05, 0.01)]:
        errs = hist[round(t, 10)]
        assert np.isclose(errs[("L2", "q")], q, rtol=1e-4)
        assert np.isclose(errs[("L2@1", "q")], q, rtol=1e-4)
        assert np.isclose(errs[("L2", "c")], c, rtol=1e-4)
        assert np.isclose(errs[("L2@1", "c")], c, rtol=1e-4)

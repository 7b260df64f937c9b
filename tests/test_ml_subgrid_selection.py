"""ML subgrid model selection ('subgrid model selection: ML').

Reference: multiscaleManager.cpp:54,438,687-790 — collect training
data for 'max subgrid ML training steps' steps, train a classifier,
then select subgrid models with it. The reference dumps text files and
shells out to a PyTorch script; this implementation trains an
in-process jax softmax regression on the usage-vote labels and runs
inference on-device.
"""

import numpy as np
import pytest

from mrhyde_tpu.driver import load_input_deck
from mrhyde_tpu.problem import make_problem

_D = ("/root/reference/regression/thermal/"
      "2D_verification_multiscale_dynamicmultimodel")


@pytest.mark.slow
def test_ml_selection_learns_usage_pattern():
    cfg = load_input_deck(f"{_D}/input.yaml")
    cfg["Solver"]["subgrid model selection"] = "ML"
    cfg["Solver"]["max subgrid ML training steps"] = 2
    p = make_problem(cfg)
    res = p.run()
    ms = p.multiscale
    # the classifier trained after 2 steps and drove steps 3-4
    assert ms._ml_W is not None
    assert ms._ml_steps == 2
    # the classifier operates at the VOTE-GROUP granularity (one
    # decision per (rank x workset group), the unit the usage vote
    # pools over) and must reproduce the group labels it trained on
    # exactly — the x - t > c pattern is linearly separable in (x, t)
    for t in (0.0, 0.1):
        agree = float(np.mean(ms._ml_predict(t) == ms._vote(t)))
        assert agree == 1.0, (t, agree)
    # extrapolation beyond the training window is necessarily
    # approximate: the per-group UNANIMITY vote quantizes the moving
    # x - t boundary into strip-chunk staircases (a group flips only
    # when the boundary clears it entirely), which no linear model can
    # time exactly from two slices. Require substantial agreement and
    # that the far-field (t = 0.3, everything owned by the default
    # model) is recovered exactly.
    agree2 = float(np.mean(ms._ml_predict(0.2) == ms._vote(0.2)))
    assert agree2 > 0.7, agree2
    agree3 = float(np.mean(ms._ml_predict(0.3) == ms._vote(0.3)))
    assert agree3 == 1.0, agree3
    # and the macro solve stayed healthy
    final = res.error_history[-1][1][("L2", "e")]
    assert np.isfinite(final) and final < 0.05


@pytest.mark.slow
def test_uq_regenerate_grains():
    """UQ with per-sample microstructure regeneration (reference:
    analysisManager.cpp:336-339): each sample solves on a fresh random
    Voronoi grain field; responses must vary across samples."""
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 8, "NY": 8, "number of seeds": 6},
        "Physics": {"modules": "linearelasticity",
                    "use crystal elasticity": True,
                    "Dirichlet conditions": {
                        "scalar data": True,
                        "dx": {"bottom": 0.0}, "dy": {"bottom": 0.0}},
                    "Neumann conditions": {"dy": {"top": "1.0"}}},
        "Discretization": {"order": {"dx": 1, "dy": 1},
                           "quadrature": 2},
        "Solver": {"solver": "steady-state",
                   "use direct solver": True},
        "Parameters": {"dummy": {"type": "scalar", "value": 1.0,
                                 "usage": "stochastic",
                                 "distribution": "uniform",
                                 "min": 0.9, "max": 1.1}},
        "Analysis": {"analysis type": "UQ",
                     "regenerate grains": True,
                     "UQ": {"samples": 3, "seed": 1}},
        "Postprocess": {"compute errors": False},
    }
    out = make_problem(cfg).run()
    resp = np.asarray(out["responses"])
    assert resp.shape[0] == 3
    assert np.all(np.isfinite(resp))
    # different grains -> different stiffness -> different responses
    assert np.std(resp) > 1e-8

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
    # post-training predictions should reproduce the vote-based
    # ownership well (the usage pattern x - t > c is linearly
    # separable in (x, t), which softmax regression represents)
    for t in (0.2, 0.3):
        pred = ms._ml_predict(t)
        vote = ms._vote(t)
        agree = float(np.mean(pred == vote))
        assert agree > 0.9, (t, agree)
    # and the macro solve stayed healthy
    final = res.error_history[-1][1][("L2", "e")]
    assert np.isfinite(final) and final < 0.05

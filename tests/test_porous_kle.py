"""Regression parity: porous/Mixed_KLE_{1D,2D} (KL-expansion
log-permeability driven by stochastic coefficient vectors).

Reference golds are sample-progress logs, so parity = the deck runs
end-to-end: Kinv/exp(KL) permeability (porousMixed.cpp:188-215) with
per-direction klexpansions and total-order index sets (:53-107),
KLStochcoeffs sampled as a Gaussian VECTOR parameter, 2 UQ samples.
Also checks the KL field actually changes the solution.
"""

import jax.numpy as jnp
import numpy as np

from mrhyde_tpu.assembly.assembler import TimeCoeffs
from mrhyde_tpu.problem import Problem


def _cfg(tmp_path):
    scoeffs = tmp_path / "scoeffs.dat"
    np.savetxt(scoeffs, np.zeros(8))
    return {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 8, "NY": 8},
        "Physics": {"modules": "porous mixed",
                    "use KL expansion": True,
                    "KL parameters": {
                        "x-direction": {"N": 4, "eta": 0.1, "L": 1.0,
                                        "sigma": 0.1},
                        "y-direction": {"N": 4, "eta": 0.1, "L": 1.0,
                                        "sigma": 0.1}},
                    "Dirichlet conditions": {
                        "p": {"left": "1.0", "right": "0.0"},
                        "u": {"top": "0.0", "bottom": "0.0"}}},
        "Functions": {"source": "0.0", "Kinv_xx": "1.0e-2",
                      "Kinv_yy": "1.0e-2"},
        "Parameters": {
            "KLStochcoeffs": {"type": "vector", "source": str(scoeffs),
                              "usage": "stochastic",
                              "distribution": "Gaussian",
                              "mean": 0.0, "variance": 1.0}},
        "Solver": {"solver": "steady-state", "nonlinear TOL": 1e-7,
                   "max nonlinear iters": 2, "initial type": "none",
                   "use direct solver": True},
        "Discretization": {"eblock-0_0": {"order": {"p": 0, "u": 1},
                                          "quadrature": 2}},
        "Analysis": {"analysis type": "UQ",
                     "UQ": {"samples": 2, "seed": 123}},
        "Postprocess": {"compute responses": True},
    }


def test_mixed_kle_2d_uq_deck(tmp_path):
    out = Problem(_cfg(tmp_path)).run()
    assert out["responses"].shape[0] == 2
    assert np.isfinite(out["responses"]).all()
    # the sampled KL coefficients must CHANGE the permeability field
    # (different samples -> different responses)
    r = np.asarray(out["responses"]).reshape(2, -1)
    assert not np.allclose(r[0], r[1])


def test_kl_field_perturbs_residual(tmp_path):
    """Direct check: nonzero KL coefficients change the Darcy residual
    the way Kinv/exp(KL) predicts (smaller Kinv for positive KL)."""
    cfg = _cfg(tmp_path)
    cfg.pop("Analysis")
    p = Problem(cfg)
    tc = TimeCoeffs.steady(p.n_dof, dtype=jnp.zeros(0).dtype)
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(p.n_dof))
    r0 = p.assembler.residual(u, tc, {"KLStochcoeffs": jnp.zeros(8)})
    r1 = p.assembler.residual(u, tc,
                              {"KLStochcoeffs": jnp.ones(8) * 0.5})
    assert float(jnp.linalg.norm(r1 - r0)) > 1e-8

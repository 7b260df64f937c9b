"""Adjoint checkpoint windowing (VERDICT r3 item 7).

jax.checkpoint windows over the transient step loop must leave the
gradient exactly as the one-graph trace computes it (rematerialization
changes memory, not math), and stay FD-correct. Reference analog:
solutionStorage.hpp:19-110 stores every accepted step; its own TODO at
solverManager.cpp:1420 concedes the adjoint checkpointing gap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrhyde_tpu.analysis.forward_ad import DifferentiableForward
from mrhyde_tpu.problem import Problem


def _make(nsteps, window):
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 6, "NY": 6},
        "Functions": {"thermal source": "src*sin(2*pi*x)*sin(2*pi*y)"},
        "Parameters": {"src": {"type": "scalar", "value": 1.5,
                               "usage": "active"}},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": 0.0}},
                    "Initial conditions": {"e": "0.0"}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "transient", "final time": 0.4,
                   "number of steps": nsteps,
                   "transient Butcher tableau": "BWE",
                   "adjoint checkpoint window": window},
        "Postprocess": {"compute errors": False},
    }
    p = Problem(cfg)

    def obj(u, t, pvec):
        return jnp.sum(u * u)

    return DifferentiableForward(p, obj)


@pytest.mark.slow
def test_windowed_gradient_matches_unwindowed():
    pvec = {"src": jnp.asarray(1.5)}
    df_plain = _make(8, -1)        # windowing disabled
    df_win = _make(8, 3)           # 3-step windows
    v0, g0 = df_plain.value_and_gradient(pvec)
    v1, g1 = df_win.value_and_gradient(pvec)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-12)
    np.testing.assert_allclose(float(g1["src"]), float(g0["src"]),
                               rtol=1e-10)


@pytest.mark.slow
def test_windowed_gradient_fd_check():
    pvec = {"src": jnp.asarray(1.5)}
    df = _make(8, 3)
    g = df.gradient(pvec)
    gfd = df.fd_gradient(pvec, eps=1e-6)
    np.testing.assert_allclose(float(g["src"]), float(gfd["src"]),
                               rtol=2e-5)


@pytest.mark.slow
def test_auto_window_engages_for_long_transients():
    df = _make(48, 0)
    # auto: sqrt windows at >= 40 steps
    pvec = {"src": jnp.asarray(1.0)}
    v, g = df.value_and_gradient(pvec)
    assert np.isfinite(float(v)) and np.isfinite(float(g["src"]))

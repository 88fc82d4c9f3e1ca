#!/usr/bin/env bash
# End-of-round gate: compile + full suite + oracle parity + bench must
# all pass before a round snapshot is considered shippable. Round 5
# ended with a HEAD compile break and shipped no driver bench; this
# script makes that impossible to repeat silently.
#
# Usage: tools/gate.sh [sf_dir_correctness] [sf_dir_bench]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_CORRECT="${1:-/root/testdata/sf0.01}"
SF_BENCH="${2:-/root/testdata/sf0.1}"
OUT=target/gate
mkdir -p "$OUT"

echo "[gate 1/4] compile + full test suite"
sbt -batch compile test

echo "[gate 2/4] correctness dump @ $SF_CORRECT"
sbt -batch "runMain graft.Verify $SF_CORRECT $OUT/verify_out"

echo "[gate 3/4] DuckDB oracle parity"
python3 tools/parity.py "$SF_CORRECT" "$OUT/verify_out" | tee "$OUT/parity.txt"
grep -q " 0 fail" "$OUT/parity.txt"

sentinel() { # host-noise sentinel: q01+q03 min-of-3 vs pinned quiet mins
  # the sentinel run's own failure must surface as a BUILD/RUNTIME
  # failure, not masquerade as "noisy window": capture sbt output to
  # a log and check both the exit status and that the JSON landed
  if ! SPARK_GRAFT_SF_DIR="$SF_BENCH" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    SPARK_GRAFT_BENCH_ONLY=q01_full_scan_agg,q03_join_star \
    SPARK_GRAFT_BENCH_OUT="$OUT/sentinel_$1.json" \
    sbt -batch "runMain graft.Bench" > "$OUT/sentinel_$1.log" 2>&1; then
    echo "gate FAILED: sentinel bench run ($1) exited non-zero —" \
      "see $OUT/sentinel_$1.log (NOT a noise verdict)" >&2
    return 2
  fi
  if [ ! -s "$OUT/sentinel_$1.json" ]; then
    echo "gate FAILED: sentinel bench run ($1) produced no JSON —" \
      "see $OUT/sentinel_$1.log (NOT a noise verdict)" >&2
    return 2
  fi
  python3 tools/check_sentinel.py "$OUT/sentinel_$1.json"
}

echo "[gate 4/4] bench (min-of-${SPARK_GRAFT_BENCH_RUNS:-3}) @ $SF_BENCH"
echo "[gate 4/4] pre-bench noise sentinel"
sentinel pre || { rc=$?; [ "$rc" -eq 2 ] || echo "gate REJECTED: noisy window (pre)"; exit 1; }
SPARK_GRAFT_SF_DIR="$SF_BENCH" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench.json" sbt -batch "runMain graft.Bench"
echo "[gate 4/4] post-bench noise sentinel (after a 60s settle)"
# the post sentinel measures the WINDOW's ambient noise, not the
# bench's own cache/GC residue — immediately after a heavy run the
# first sentinel sample reads high even on an idle host (r10
# BASELINE.md host-state note), so let the residue drain first
sleep 60
sentinel post || { rc=$?; [ "$rc" -eq 2 ] || echo "gate REJECTED: noisy window (post)"; exit 1; }
python3 - "$OUT/bench.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
assert not d.get("failed"), f"bench failures: {d['failed']}"
print(f"gate OK: {len(d['queries'])} queries, total {d['value']:.1f}s "
      f"(min of {d.get('runs', 1)} runs)")
EOF

# optional stage 5 (default on — VERDICT r11 item 5): regenerate the
# steady-state probe table (BASELINE.md's probe story) per round
# instead of hand-run windows. SPARK_GRAFT_GATE_PROBE=0 skips it; a
# probe failure fails the gate (it is part of the shipped artifact).
if [ "${SPARK_GRAFT_GATE_PROBE:-1}" = "1" ]; then
  echo "[gate 5/5] steady-state probe bench @ $SF_BENCH"
  SPARK_GRAFT_SF_DIR="$SF_BENCH" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    sbt -batch "runMain graft.tools.ProbeBench" 2>&1 \
    | grep '\[probebench\]' | tee "$OUT/probebench.txt"
  [ -s "$OUT/probebench.txt" ] || {
    echo "gate FAILED: ProbeBench produced no rows" >&2; exit 1; }
fi

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

echo "[gate 4/4] bench (min-of-${SPARK_GRAFT_BENCH_RUNS:-3}) @ $SF_BENCH"
SPARK_GRAFT_SF_DIR="$SF_BENCH" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench.json" sbt -batch "runMain graft.Bench"
python3 - "$OUT/bench.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
assert not d.get("failed"), f"bench failures: {d['failed']}"
print(f"gate OK: {len(d['queries'])} queries, total {d['value']:.1f}s "
      f"(min of {d.get('runs', 1)} runs)")
EOF

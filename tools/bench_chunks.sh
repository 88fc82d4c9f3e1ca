#!/usr/bin/env bash
# Fresh-JVM chunked bench (VERDICT r9 item 7): run the registry in K
# round-robin slices, ONE sbt/Spark JVM each, and merge the per-query
# minimums into a single bench JSON. This removes the late-sweep
# JVM/codegen-cache decay a 300+-query single-JVM sweep accumulates
# (the q155 lesson: 1.57s standalone vs 3.86s at sweep position 150+)
# so the artifact measures plans, not cache pressure. Costs K session
# startups (amortized by the per-JVM warmup query), so it is the
# diagnostic mode — the official artifact stays the single-JVM sweep
# unless BASELINE.md says otherwise for a round.
#
# Usage: tools/bench_chunks.sh [K] [sf_dir] [out.json]
set -euo pipefail
cd "$(dirname "$0")/.."

K="${1:-4}"
SF="${2:-/root/testdata/sf0.1}"
OUT="${3:-target/gate/bench_chunks.json}"
mkdir -p "$(dirname "$OUT")" target/gate

for i in $(seq 0 $((K - 1))); do
  echo "[bench_chunks] slice $i/$K"
  if ! SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    SPARK_GRAFT_BENCH_SLICE="$i/$K" \
    SPARK_GRAFT_BENCH_OUT="target/gate/bench_chunk_$i.json" \
    sbt -batch "runMain graft.Bench" > "target/gate/bench_chunk_$i.log" 2>&1; then
    echo "[bench_chunks] slice $i FAILED — see target/gate/bench_chunk_$i.log" >&2
    exit 1
  fi
done

python3 - "$OUT" "$K" <<'EOF'
import json, sys
out, k = sys.argv[1], int(sys.argv[2])
queries, failed, runs = {}, [], None
sf = None
for i in range(k):
    d = json.load(open(f"target/gate/bench_chunk_{i}.json"))
    queries.update(d["queries"])
    failed.extend(d.get("failed", []))
    runs = d.get("runs", runs)
    sf = d.get("sf", sf)
total = sum(v for v in queries.values() if v is not None)
merged = {"metric": "total", "value": total, "unit": "sec",
          "runs": runs, "mode": f"fresh_jvm_chunks_{k}",
          "queries": dict(sorted(queries.items())),
          "failed": sorted(set(failed)), "sf": sf}
json.dump(merged, open(out, "w"))
print(f"bench_chunks OK: {len(queries)} queries, total {total:.1f}s "
      f"({k} fresh JVMs, min of {runs} runs each)")
EOF

#!/usr/bin/env python3
"""Rotating sf0.1 oracle parity (VERDICT r13 item 4).

The per-round gate checks every query at sf0.01; the order-
independence discipline (decimal sums, mu-quantized chains, two-phase
prefix scans) is exactly the kind of property that only breaks under
MORE partitions / different merge orders. This tool re-runs the
DuckDB compare for a ~30-query slice at sf0.1 each round, rotating so
every registry query cycles through within ~12 rounds.

Usage:  python3 tools/parity_sf01.py <round-number> [slice-size]

Writes PARITY_SF01_r<N>.json at the repo root (commit it) with the
slice, the per-query verdicts, and the parity tail line. The slice is
derived from SURVEY.md section-2 keys (sorted, stable between rounds
as long as queries are only appended).
"""
import json
import os
import re
import subprocess
import sys


def main(round_no: int, size: int = 30) -> int:
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    keys = sorted(set(re.findall(r"`(q\d+_[a-z0-9_]+)`",
                                 open("SURVEY.md").read())))
    n = len(keys)
    start = ((round_no - 1) * size) % n
    subset = [keys[(start + i) % n] for i in range(min(size, n))]
    sf_dir = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
    out = f"target/parity_sf01_r{round_no}"
    print(f"[parity_sf01] round {round_no}: {len(subset)} queries "
          f"starting at index {start} of {n}")
    env = dict(os.environ, SPARK_GRAFT_VERIFY_ONLY=",".join(subset))
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out}"],
        check=True, env=env)
    r = subprocess.run(
        [sys.executable, "tools/parity.py", sf_dir, out],
        capture_output=True, text=True)
    sys.stdout.write(r.stdout)
    lines = [l.strip() for l in r.stdout.splitlines() if l.strip()]
    tail = lines[-1] if lines else ""
    m = re.search(r"parity: (\d+) pass, (\d+) fail", tail)
    verdicts = {}
    for l in lines:
        mm = re.match(r"[✓✗~] (q\w+)", l)
        if mm:
            verdicts[mm.group(1)] = l[0]
    artifact = {
        "round": round_no,
        "sf_dir": sf_dir,
        "slice_start": start,
        "n_registry": n,
        "subset": subset,
        "verdicts": verdicts,
        "pass": int(m.group(1)) if m else None,
        "fail": int(m.group(2)) if m else None,
        "tail": tail,
    }
    dest = f"PARITY_SF01_r{round_no}.json"
    json.dump(artifact, open(dest, "w"), indent=1, ensure_ascii=False)
    print(f"[parity_sf01] wrote {dest}: {tail}")
    return 0 if (m and int(m.group(2)) == 0) else 1


if __name__ == "__main__":
    rn = int(sys.argv[1])
    sz = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    sys.exit(main(rn, sz))

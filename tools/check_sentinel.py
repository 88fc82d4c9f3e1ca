#!/usr/bin/env python3
"""Host-noise sentinel check (VERDICT r8 item 2): two cheap, stable
queries (q01 full-scan agg, q03 star join) are benched min-of-3
before AND after the official bench; if either drifts >20% above its
pinned quiet-window minimum, the window is declared noisy and the
bench artifact must not be used as a round baseline.

Usage: check_sentinel.py <sentinel_bench.json> [pins.json]
Exit 0 = window clean, 1 = noisy (or pins missing).

Re-pin (only from a window where repeated sentinel runs agree):
  python3 tools/check_sentinel.py --pin <sentinel_bench.json>
"""
import json
import sys

PINS_PATH = "tools/sentinel_pins.json"
TOLERANCE = 1.20
# Absolute grace on top of the relative band (r10): a 0.3s sentinel
# has a ~50ms JVM/page-cache noise floor that is NOT proportional to
# query cost — with a purely relative band the q01 pin flip-flopped
# across 8 agreeing quiet-window runs (0.32-0.41s vs pin 0.3046,
# BASELINE.md r10 host-state note) and r9's closing gate tripped at
# +0.1%. 50ms is immaterial for every pinned query above ~1s.
ABS_GRACE = 0.05

def mins(path):
    d = json.load(open(path))
    return {k: v for k, v in d["queries"].items() if v is not None}

if sys.argv[1] == "--pin":
    m = mins(sys.argv[2])
    json.dump(m, open(PINS_PATH, "w"), indent=1)
    print(f"pinned {m} -> {PINS_PATH}")
    sys.exit(0)

bench = sys.argv[1]
pins_path = sys.argv[2] if len(sys.argv) > 2 else PINS_PATH
try:
    pins = json.load(open(pins_path))
except FileNotFoundError:
    print(f"sentinel: no pins at {pins_path} — run --pin from a quiet "
          "window first")
    sys.exit(1)

m = mins(bench)
noisy = []
for q, pin in pins.items():
    got = m.get(q)
    if got is None:
        noisy.append(f"{q}: missing from sentinel run")
    elif got > pin * TOLERANCE + ABS_GRACE:
        noisy.append(f"{q}: {got:.2f}s vs pinned {pin:.2f}s "
                     f"(+{(got/pin-1)*100:.0f}% > {int((TOLERANCE-1)*100)}%"
                     f" + {ABS_GRACE*1000:.0f}ms)")
for q, pin in pins.items():
    got = m.get(q)
    if got is not None and got <= pin * TOLERANCE + ABS_GRACE:
        print(f"sentinel OK {q}: {got:.2f}s (pin {pin:.2f}s)")
if noisy:
    print("NOISY WINDOW — bench artifact is not judge-grade:")
    for line in noisy:
        print(" ", line)
    sys.exit(1)

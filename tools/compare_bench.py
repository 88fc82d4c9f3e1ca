#!/usr/bin/env python3
"""Protocol-rule diff of two graft bench JSONs (BASELINE.md §2):

- EQUAL-COUNT rule: the shared-query sum-of-mins may grow ≤ 20%
  before the round is called a regression.
- DOUBLING rule: any shared query whose min more than doubles is
  flagged (sub-1s queries are exempt — scheduler/GC noise, §2b).
- Top movers both ways and the added/removed key sets are printed so
  a regression report writes itself.

Usage: compare_bench.py <old.json> <new.json> [--top N]
Exit 0 = inside both rules, 1 = regression by either rule.

Works on any Bench-shaped JSON: the official single-JVM artifact,
a bench_chunks.sh merged artifact (mode fresh_jvm_chunks_k), or the
driver's bench_out.json — comparing a chunked artifact against a
single-JVM one of the same round measures the JVM/codegen cache-decay
tax per query (the q155 lesson, generalized).
"""
import json
import sys

GROWTH_LIMIT = 1.20
DOUBLE_FLOOR = 1.0  # seconds: sub-second doublings are noise (§2b)


def mins(path):
    d = json.load(open(path))
    return d, {k: v for k, v in d["queries"].items() if v is not None}


def main():
    # strip --top AND its value from the positionals, wherever it
    # appears — `--top 5 old.json new.json` must not open '5' as a file
    argv = sys.argv[1:]
    top = 10
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    old_doc, old = mins(args[0])
    new_doc, new = mins(args[1])
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    s_old = sum(old[k] for k in shared)
    s_new = sum(new[k] for k in shared)
    ratio = s_new / s_old if s_old else float("inf")
    print(f"old: {len(old)} queries, {sum(old.values()):.1f}s "
          f"(mode {old_doc.get('mode', 'single-jvm')})")
    print(f"new: {len(new)} queries, {sum(new.values()):.1f}s "
          f"(mode {new_doc.get('mode', 'single-jvm')})")
    print(f"shared {len(shared)}: {s_old:.1f}s -> {s_new:.1f}s "
          f"({(ratio - 1) * 100:+.1f}%)")
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{k} {new[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    doubled = [(k, old[k], new[k]) for k in shared
               if new[k] > 2 * old[k] and new[k] > DOUBLE_FLOOR]
    movers = sorted(shared, key=lambda k: new[k] - old[k])
    print(f"top +{top} (new slower):")
    for k in movers[-top:][::-1]:
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} ({new[k]-old[k]:+.2f})")
    print(f"top -{top} (new faster):")
    for k in movers[:top]:
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} ({new[k]-old[k]:+.2f})")
    bad = False
    if ratio > GROWTH_LIMIT:
        print(f"REGRESSION (equal-count rule): shared sum "
              f"+{(ratio-1)*100:.0f}% > {(GROWTH_LIMIT-1)*100:.0f}%")
        bad = True
    if doubled:
        print("REGRESSION (doubling rule, >1s):")
        for k, o, n in sorted(doubled, key=lambda t: -t[2]):
            print(f"  {k}: {o:.2f} -> {n:.2f} ({n/o:.1f}x)")
        bad = True
    if not bad:
        print("OK: inside the 20% equal-count rule, no >1s query doubled")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

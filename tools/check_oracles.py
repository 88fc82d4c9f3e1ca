#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB oracle compare.

Usage: check_oracles.py [SF_DIR] [VERIFY_OUT] [only_query ...]
Loads oracle_sql.json from VERIFY_OUT, runs each SQL against the
parquet tables in SF_DIR, and diffs rows (sorted, column-name-sorted)
against the Spark parquet dumps. Prints a PASS/FAIL line per query.
"""
import json
import math
import sys

import duckdb
import pyarrow.dataset as ds

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_r5"
ONLY = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def canon(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    # None-safe sort key (tuples with None don't compare in py3)
    key = lambda t: tuple((v is None, str(v)) for v in t)
    return cols, sorted((tuple(norm(r[i]) for i in order) for r in rows), key=key)


fails = 0
for name in sorted(oracles):
    if ONLY and name not in ONLY:
        continue
    sql = oracles[name]
    try:
        tbl = ds.dataset(f"{OUT}/{name}", format="parquet").to_table()
        s_cols, s_rows = canon(tbl.column_names,
                               [list(r.values()) for r in tbl.to_pylist()])
    except Exception as e:
        print(f"{name}: SPARK-READ-FAIL {e}")
        fails += 1
        continue
    try:
        cur = con.execute(sql)
        d_names = [d[0] for d in cur.description]
        d_cols, d_rows = canon(d_names, cur.fetchall())
    except Exception as e:
        print(f"{name}: ORACLE-FAIL {type(e).__name__}: {e}")
        fails += 1
        continue
    if s_cols != d_cols:
        print(f"{name}: COLS-MISMATCH spark={s_cols} duck={d_cols}")
        fails += 1
        continue
    if s_rows == d_rows:
        print(f"{name}: PASS ({len(s_rows)} rows)")
        continue
    fails += 1
    print(f"{name}: ROWS-MISMATCH spark={len(s_rows)} duck={len(d_rows)}")
    s_set, d_set = set(s_rows), set(d_rows)
    for lbl, diff in [("spark-only", s_set - d_set), ("duck-only", d_set - s_set)]:
        if diff:
            print(f"  {lbl} ({len(diff)}): {sorted(diff)[:4]}")
    if not s_set - d_set and not d_set - s_set:
        print("  (same sets — multiplicity or order difference)")
print(f"== {fails} failures ==")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""One-off probe: can q23/q26/q28 be promoted to exact oracles?

Compares the current Verify outputs against brute-force DuckDB
equivalents (all-pairs ≥ tau / exact top-k). Dev tool only.
"""
import sys

import duckdb
import pyarrow.dataset as ds

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_r4"

con = duckdb.connect()
for t in ["documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def spark_rows(name):
    tbl = ds.dataset(f"{OUT}/{name}", format="parquet").to_table()
    return sorted(tuple(r[c] for c in tbl.column_names) for r in tbl.to_pylist()), tbl.column_names


# --- q23: all-pairs word-3-gram jaccard >= 0.7 --------------------
q23_sql = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, 'zq ' || text FROM documents WHERE doc_id % 25 = 0
), toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
  FROM corpus
), sets AS (
  SELECT doc_id,
    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         ELSE list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
    END AS g
  FROM toks
), pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
    len(list_intersect(x.g, y.g)) * 1.0
      / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g))) AS jaccard
  FROM sets x JOIN sets y ON x.doc_id < y.doc_id
)
SELECT a, b, jaccard FROM pairs WHERE jaccard >= 0.7 ORDER BY a, b
"""

# --- q26: all-pairs float-exact scaled-copy cosine >= 0.95 --------
cos = lambda a, b: f"""(list_reduce(list_prepend(CAST(0 AS DOUBLE),
    list_transform(range(1, len({a}) + 1), i -> CAST({a}[i] AS DOUBLE)*CAST({b}[i] AS DOUBLE))), (acc, v) -> acc + v)
  / sqrt(
    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      list_transform({a}, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))), (acc, v) -> acc + v)
    * list_reduce(list_prepend(CAST(0 AS DOUBLE),
      list_transform({b}, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))), (acc, v) -> acc + v)))"""

q26_sql = f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
    list_transform(embedding, x -> CAST(x * CAST(1.01 AS FLOAT) AS FLOAT))
  FROM embeddings WHERE vec_id % 25 = 0
), pairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
    {cos('x.embedding', 'y.embedding')} AS craw
  FROM corpus x JOIN corpus y ON x.vec_id < y.vec_id
)
SELECT a, b, craw FROM pairs WHERE craw >= 0.95 ORDER BY a, b
"""


def compare(name, sql, round_cols=None):
    sr, cols = spark_rows(name)
    dr = sorted(tuple(r) for r in con.execute(sql).fetchall())
    print(f"{name}: spark={len(sr)} oracle={len(dr)} cols={cols}")
    s_set, d_set = set(sr), set(dr)
    miss = d_set - s_set
    extra = s_set - d_set
    if miss:
        print(f"  oracle-only ({len(miss)}): {sorted(miss)[:5]}")
    if extra:
        print(f"  spark-only ({len(extra)}): {sorted(extra)[:5]}")
    if not miss and not extra:
        print("  EXACT MATCH")


compare("q23_dedup_minhash", q23_sql)
compare("q26_dedup_embedding", q26_sql)

# q26 rounding check: spark rounds cos to 4dp currently
sr26, _ = spark_rows("q26_dedup_embedding")
print("q26 sample spark:", sr26[:3])
print("q26 sample duck :", con.execute(q26_sql).fetchall()[:3])

# --- q28 vs q27: does LSH top-k equal exact top-k? ----------------
sr27, _ = spark_rows("q27_ann_bruteforce")
sr28, _ = spark_rows("q28_ann_lsh")
print(f"q27 vs q28: {'IDENTICAL' if sr27 == sr28 else 'DIFFER'}")
if sr27 != sr28:
    d = [(a, b) for a, b in zip(sr27, sr28) if a != b]
    print("  diffs:", d[:5])

# --- q37 vs q27 (curiosity) ---------------------------------------
sr37, _ = spark_rows("q37_ann_ivf")
print(f"q27 vs q37: {'IDENTICAL' if sr27 == sr37 else 'DIFFER'}")

#!/usr/bin/env python3
"""Build the sf1 (10x sf0.1) SCALE-REHEARSAL dataset under
target/sf1/ — runtime-scaling measurements only, never correctness
oracles (the driver's oracle SFs stay sf0.01/sf0.1).

Replication scheme (r = 0..9, r0 = the original rows):
- documents: doc_id + r*1_000_000; for r>0 a replica token 'zr<r>'
  is prepended to every 8th word, which caps cross-replica /
  replica-vs-original 3-shingle Jaccard at ~0.45 (< every dedup tau
  in the registry) — the dedup families then see 10 independent
  corpora of the original shape (pair volume scales ~linearly)
  instead of an adversarial 10-identical-copies corpus where every
  bucket blows up 100x in pairs. Filler stays ~11% of tokens (an
  every-word interleave would make it 50% of ALL tokens AND double
  the token volume — a corpus shape no real data has; Zipf heads
  top out ~5% — so ratios would measure the fixture, not the
  engine). Note the hot-key skew itself is MEASURED harmless: a
  controlled A/B at 10M bigrams ran the 50%-hot-token corpus within
  noise of a benign one (SkewRobustnessSpec) — partial aggregation
  + AQE absorb it.
- embeddings: vec_id + r*1_000_000; the vector is cyclically
  shifted by 6r positions for r>0 — norm/component distribution
  preserved, but shifted copies decorrelate (cosine ~ that of
  unrelated vectors), avoiding the same 10-identical-twins cluster
  explosion for the ANN/semantic families.
- lineitem/orders: *_orderkey + r*10_000_000 (the join stays
  consistent); part/supp/cust keys untouched — dims are unscaled,
  exactly like a 10x fact growth against fixed dimensions.
- events: event_id + r*100_000_000, user_id + r*1_000_000 (10x
  users, same per-user history shape), ts unchanged.
- region/nation/customer/supplier/part: copied as-is.
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
R = 10

os.makedirs(DST, exist_ok=True)
c = duckdb.connect()


def gen(table, select_for_r):
    parts = [select_for_r(r) for r in range(R)]
    sql = " UNION ALL ".join(parts)
    out = f"{DST}/{table}.parquet"
    c.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = c.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"{table}: {n} rows -> {out}")


def src(table):
    return f"read_parquet('{SRC}/{table}.parquet')"


gen("documents", lambda r: (
    f"SELECT doc_id + {r*1_000_000} AS doc_id, "
    + ("text, " if r == 0 else
       f"array_to_string(list_transform(range(1, "
       f"len(string_split(text, ' ')) + 1), "
       f"i -> CASE WHEN i % 8 = 1 THEN 'zr{r} ' || "
       f"string_split(text, ' ')[i] ELSE string_split(text, ' ')[i] END), "
       f"' ') AS text, ")
    + "lang, source, "
    + ("n_chars " if r == 0 else
       f"CAST(length(array_to_string(list_transform(range(1, "
       f"len(string_split(text, ' ')) + 1), "
       f"i -> CASE WHEN i % 8 = 1 THEN 'zr{r} ' || "
       f"string_split(text, ' ')[i] ELSE string_split(text, ' ')[i] END), "
       f"' ')) AS BIGINT) AS n_chars ")
    + f"FROM {src('documents')}"))

gen("embeddings", lambda r: (
    f"SELECT vec_id + {r*1_000_000} AS vec_id, "
    + ("embedding, " if r == 0 else
       f"embedding[{6*r % 64 + 1}:64] || embedding[1:{6*r % 64}] "
       "AS embedding, ")
    + f"label FROM {src('embeddings')}"))

gen("lineitem", lambda r: (
    f"SELECT l_orderkey + {r*10_000_000} AS l_orderkey, l_partkey, "
    "l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, "
    f"l_tax, l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}"))

gen("orders", lambda r: (
    f"SELECT o_orderkey + {r*10_000_000} AS o_orderkey, o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
    f"FROM {src('orders')}"))

gen("events", lambda r: (
    f"SELECT event_id + {r*100_000_000} AS event_id, ts, "
    f"user_id + {r*1_000_000} AS user_id, event_type, value, props "
    f"FROM {src('events')}"))

for t in ["region", "nation", "customer", "supplier", "part"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print(f"{t}: copied")
print("sf1 ready at", DST)

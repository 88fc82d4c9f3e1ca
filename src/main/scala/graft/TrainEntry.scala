package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** q113+: the training-data tail — leakage-safe splits, mergeable
  * sketch profiling, embedding quantization, HTML main-text
  * extraction, snapshot time travel. Same conventions as the earlier
  * entry objects: exact DuckDB oracles where the math is portable,
  * contract gates where the operator is inherently randomized.
  */
object TrainEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------
  // q113 — leakage-safe train/val/test split: exact copies are
  // injected (ids + 1e6), then split assignment keys on the dup
  // CLUSTER representative, so a copy always lands in its original's
  // split. The in-query require is the operator's invariant (no
  // cluster straddles splits); the gated output is the per-split
  // census, which the oracle recomputes by grouping on text itself —
  // graft's (xxhash64, length) cluster key never ships bodies, but
  // must elect the same representatives.
  // ---------------------------------------------------------------
  private def q113(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Split
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val copies = docs.filter(col("doc_id") % 20 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val assigned = Split.byCluster(docs.unionAll(copies), "doc_id", "text")
    val leaks = assigned.groupBy("cluster_rep")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    require(leaks == 0, s"$leaks duplicate clusters straddle splits")
    assigned.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_rep")).as("n_clusters"),
        sum(col("doc_id")).as("sum_ids"))
      .orderBy("split")
  }

  // ---------------------------------------------------------------
  // q114 — mergeable quantile sketches (KLL): per-group partial
  // sketches are built in one pass, then RE-AGGREGATED by merging the
  // sketch bytes (never re-reading rows) — the shape that lets 100 TB
  // profiling run as "merge yesterday's sketches with today's". The
  // gate is the sketch's own contract, checked against exact ranks
  // computed from the data: the true rank interval of each extracted
  // quantile [#<q̂, #≤q̂]/n must intersect p ± 2ε (interval form
  // because l_quantity/l_discount are heavy discrete atoms whose
  // inclusive rank legitimately overshoots p). Oracle = VALUES
  // literal, like the other randomized-sketch contracts (q45 HLL).
  // ---------------------------------------------------------------
  private def q114(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.SketchAgg
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val probs = Seq(0.1, 0.5, 0.9, 0.99)

    // phase 1: per-group partial sketches (the persistable artifact)
    val perFlag = li.groupBy("l_returnflag").agg(
      SketchAgg.kllSketch(col(cols.head)).as(s"sk_${cols.head}"),
      cols.tail.map(c => SketchAgg.kllSketch(col(c)).as(s"sk_$c")): _*)
    // phase 2: merge the sketches — no row is touched again
    val merged = perFlag.agg(
      SketchAgg.kllMerge(col(s"sk_${cols.head}")).as(cols.head),
      cols.tail.map(c => SketchAgg.kllMerge(col(s"sk_$c")).as(c)): _*)
    val qRow = merged.select(
      cols.map(c => SketchAgg.kllQuantiles(col(c), probs).as(c)): _*).head()
    val approx: Map[String, Seq[Double]] =
      cols.map(c => c -> qRow.getSeq[Double](qRow.fieldIndex(c))).toMap

    // exact rank interval of each estimate: one count-if pass
    val rankAggs = for { c <- cols; (_, i) <- probs.zipWithIndex; strict <- Seq(true, false) }
      yield (count(when(if (strict) col(c) < approx(c)(i)
          else col(c) <= approx(c)(i), 1)) / count(lit(1)))
        .as(s"${c}_${i}_$strict")
    val r = li.agg(rankAggs.head, rankAggs.tail: _*).head()
    val eps = 2 * SketchAgg.rankError()
    val checks = for { c <- cols; (p, i) <- probs.zipWithIndex } yield {
      val lo = r.getDouble(r.fieldIndex(s"${c}_${i}_true"))
      val hi = r.getDouble(r.fieldIndex(s"${c}_${i}_false"))
      (c, p, lo <= p + eps && hi >= p - eps)
    }
    checks.toDF("column_name", "p", "within_bound")
      .orderBy("column_name", "p")
  }

  // ---------------------------------------------------------------
  // q115 — int8 embedding quantization (the index-size lever for
  // retrieval at 100 TB: 4× smaller than float32, training-free,
  // per-vector): codes, per-vector scale, and their census are a pure
  // projection — zero exchanges — and use only engine-portable
  // arithmetic (floor-based rounding), so DuckDB recomputes the
  // EXACT same codes from the same parquet floats.
  // ---------------------------------------------------------------
  private def q115(s: SparkSession, dir: String): DataFrame = {
    import graft.ann.Quantize
    val q = Quantize.corpus(t(s, dir, "embeddings"), "embedding")
    q.select(col("vec_id"),
        size(col("codes")).cast("long").as("n_dims"),
        aggregate(col("codes"), lit(0L), (acc, x) => acc + x).as("q_sum"),
        array_min(col("codes")).cast("long").as("q_min"),
        array_max(col("codes")).cast("long").as("q_max"),
        floor(col("scale") * 1e6).cast("long").as("scale_u"))
      .orderBy("vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_split_leakage_safe" -> (q113 _),
    "q114_sketch_quantiles" -> (q114 _),
    "q115_embedding_int8" -> (q115 _))

  val oracleSql: Map[String, String] = Map(
    "q115_embedding_int8" ->
      """WITH q AS (
        |  SELECT vec_id, embedding AS e,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
        |  FROM embeddings
        |), c AS (
        |  SELECT vec_id, s,
        |    CASE WHEN s = 0 THEN list_transform(e, x -> 0)
        |      ELSE list_transform(e,
        |        x -> CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS INT)) END AS codes
        |  FROM q
        |)
        |SELECT vec_id, CAST(len(codes) AS BIGINT) AS n_dims,
        |  CAST(list_sum(codes) AS BIGINT) AS q_sum,
        |  CAST(list_min(codes) AS BIGINT) AS q_min,
        |  CAST(list_max(codes) AS BIGINT) AS q_max,
        |  CAST(floor(s * 1000000.0) AS BIGINT) AS scale_u
        |FROM c ORDER BY vec_id""".stripMargin,
    "q114_sketch_quantiles" ->
      """SELECT column_name, CAST(p AS DOUBLE) AS p, within_bound FROM (VALUES
        |  ('l_discount', 0.1, TRUE), ('l_discount', 0.5, TRUE),
        |  ('l_discount', 0.9, TRUE), ('l_discount', 0.99, TRUE),
        |  ('l_extendedprice', 0.1, TRUE), ('l_extendedprice', 0.5, TRUE),
        |  ('l_extendedprice', 0.9, TRUE), ('l_extendedprice', 0.99, TRUE),
        |  ('l_quantity', 0.1, TRUE), ('l_quantity', 0.5, TRUE),
        |  ('l_quantity', 0.9, TRUE), ('l_quantity', 0.99, TRUE)
        |) AS t(column_name, p, within_bound)
        |ORDER BY column_name, p""".stripMargin,
    "q113_split_leakage_safe" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 20 = 0
        |), c AS (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep
        |  FROM corpus
        |)
        |SELECT CASE WHEN rep % 10 < 8 THEN 'train'
        |  WHEN rep % 10 < 9 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, count(DISTINCT rep) AS n_clusters,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
        |FROM c GROUP BY 1 ORDER BY split""".stripMargin)
}

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_split_leakage_safe" -> (q113 _))

  val oracleSql: Map[String, String] = Map(
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

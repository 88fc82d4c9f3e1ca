package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted mergeable EXACT moment states — the merge-don't-rescan
  * discipline (q45 HLL / q114 KLL / q190 bitmaps) applied to
  * mean/variance monitoring: each ingest batch reduces to a tiny
  * (key → n, Σ, Σx²) state table persisted as parquet; any set of
  * states MERGES by integer addition (exact — unlike streamed
  * Welford floats, decimal sums commute perfectly), and the
  * mean/variance finalize from the merged sums. A 100 TB history is
  * never rescanned: day N's stats cost one batch scan + a
  * keys-sized merge.
  *
  * Exactness: values are cents BIGINTs; Σ and Σx² run in
  * DECIMAL(38,0) (no overflow at any row count); finalize is the
  * textbook (Σx² − Σ²/n)/(n−1) in one fixed double chain rounded
  * 6 dp — identical to computing over the union directly, which is
  * exactly what the oracle does.
  */
object Moments {

  /** Reduce a batch to its per-key moment state. */
  def state(batch: DataFrame, keys: Seq[String], centsCol: String)
      : DataFrame = {
    val c = col(centsCol).cast("decimal(38,0)")
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(c).as("sum_c"),
        sum(c * c).as("sumsq_c"))
  }

  /** Merge any number of persisted states (same key schema). */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_c")).as("sum_c"),
        sum(col("sumsq_c")).as("sumsq_c"))

  /** Finalize a (merged) state into mean/variance, value units
    * (cents ÷ 100). Variance is the n−1 sample variance; single-row
    * keys report null variance (stated). */
  def finalize(state: DataFrame): DataFrame = {
    val n = col("n").cast("double")
    val s = col("sum_c").cast("double")
    val s2 = col("sumsq_c").cast("double")
    state.select(state.columns.filterNot(
        Seq("sum_c", "sumsq_c").contains).map(col) ++ Seq(
      round(s / (n * 100), 6).as("mean"),
      when(col("n") > 1,
        round((s2 - s * s / n) / ((n - 1) * 1e4), 6)).as("variance")): _*)
  }

  /** DuckDB restatement — the direct recompute over
    * `rel(g, cents)` that the merged states must equal exactly;
    * ends in `mom_out(g, n, mean, variance)`. */
  def directSql(rel: String): String =
    s"""mom_s AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST(cents AS HUGEINT)) AS sum_c,
       |    sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
       |      AS sumsq_c
       |  FROM $rel GROUP BY g
       |), mom_out AS (
       |  SELECT g, n,
       |    round(CAST(sum_c AS DOUBLE) / (CAST(n AS DOUBLE) * 100), 6)
       |      AS mean,
       |    CASE WHEN n > 1 THEN
       |      round((CAST(sumsq_c AS DOUBLE)
       |          - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE)
       |            / CAST(n AS DOUBLE))
       |        / ((CAST(n AS DOUBLE) - 1) * 1e4), 6) END AS variance
       |  FROM mom_s
       |)""".stripMargin
}

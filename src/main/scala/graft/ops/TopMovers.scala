package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top movers between two batches — the dashboard staple "which keys
  * gained/lost the most share since yesterday": per-key share deltas
  * on exact counts, top-k by absolute movement. The triage view that
  * turns q86/q304's aggregate drift number into the keys CAUSING it.
  *
  * Exactness: shares are single exact-int divisions; the delta is a
  * fixed difference of those chains rounded 9 dp; ranking uses the
  * (|delta| DESC, key) total order so the LIMIT is deterministic.
  *
  * Scale shape: one conditional-count groupBy over the union, one
  * keys-sized window. Never joins the raw batches.
  */
object TopMovers {

  /** Top `k` movers of `keyCol` share between rows where `isB` is
    * false (batch A) vs true (batch B). Returns
    * (key, n_a, n_b, share_a, share_b, delta). */
  def movers(
      df: DataFrame,
      keyCol: String,
      isB: org.apache.spark.sql.Column,
      k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(sum(when(isB, 0L).otherwise(1L)).as("n_a"),
        sum(when(isB, 1L).otherwise(0L)).as("n_b"))
    // totals via a broadcast 1-row aggregate (exchange-reused with
    // the counts groupBy), not an unpartitioned full-frame window
    // over the key census (r13 sweep)
    val shared = counts
      .crossJoin(broadcast(counts.agg(sum(col("n_a")).as("ta"),
        sum(col("n_b")).as("tb"))))
      .withColumn("share_a", round(col("n_a").cast("double") /
        col("ta").cast("double"), 9))
      .withColumn("share_b", round(col("n_b").cast("double") /
        col("tb").cast("double"), 9))
      .withColumn("delta", round(col("n_b").cast("double") /
        col("tb").cast("double") - col("n_a").cast("double") /
        col("ta").cast("double"), 9))
    // top-k via orderBy+limit = TakeOrdered, never a global
    // row_number sort of every key through one reducer; the
    // (|delta| DESC, key) key is a total order, identical kept set
    shared.orderBy(abs(col("delta")).desc, col("key")).limit(k)
      .select("key", "n_a", "n_b", "share_a", "share_b", "delta")
  }

  /** DuckDB restatement over `mv_rel(key, isb)` (isb 0/1); ends in
    * `mv_out(key, n_a, n_b, share_a, share_b, delta)`. */
  def moversSql(k: Int = 10): String =
    s"""mv_counts AS (
       |  SELECT key, CAST(sum(1 - isb) AS BIGINT) AS n_a,
       |    CAST(sum(isb) AS BIGINT) AS n_b
       |  FROM mv_rel GROUP BY key
       |), mv_sh AS (
       |  SELECT key, n_a, n_b,
       |    round(CAST(n_a AS DOUBLE)
       |      / CAST(sum(n_a) OVER () AS DOUBLE), 9) AS share_a,
       |    round(CAST(n_b AS DOUBLE)
       |      / CAST(sum(n_b) OVER () AS DOUBLE), 9) AS share_b,
       |    round(CAST(n_b AS DOUBLE)
       |        / CAST(sum(n_b) OVER () AS DOUBLE)
       |      - CAST(n_a AS DOUBLE)
       |        / CAST(sum(n_a) OVER () AS DOUBLE), 9) AS delta
       |  FROM mv_counts
       |), mv_out AS (
       |  SELECT key, n_a, n_b, share_a, share_b, delta FROM (
       |    SELECT *, row_number() OVER
       |      (ORDER BY abs(delta) DESC, key) AS rk
       |    FROM mv_sh)
       |  WHERE rk <= $k
       |)""".stripMargin
}

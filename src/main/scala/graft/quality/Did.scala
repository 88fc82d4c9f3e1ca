package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Difference-in-differences estimator — the quasi-experimental
  * sibling of [[Cuped]]'s variance reduction: when treatment was
  * rolled out at a known cutoff instead of randomized, the effect
  * estimate is (treated post − treated pre) − (control post −
  * control pre), which cancels both group-level baselines and
  * shared time shocks (Card & Krueger 1994).
  *
  * Exactness: cell sums run in DECIMAL(18,6) (order-independent);
  * each cell mean is one exact-decimal-over-int division rounded to
  * 6 dp, and the DiD is differences of those rounded doubles —
  * bit-identical across engines.
  *
  * Scale shape: one partial-aggregable groupBy(stratum) with four
  * conditional sums — a single pass, no joins, no window; the output
  * is strata-sized.
  */
object Did {

  /** Per-stratum 2×2 cell means + DiD. `treatCol` / `postCol` are
    * boolean columns; `yCol` numeric. Strata with an EMPTY cell get
    * a null DiD (stated, not imputed). */
  def estimate(
      df: DataFrame,
      stratumCol: String,
      treatCol: String,
      postCol: String,
      yCol: String): DataFrame = {
    val y = col(yCol).cast("decimal(18,6)")
    def cell(t: Boolean, p: Boolean) = {
      val m = col(treatCol) === t && col(postCol) === p
      (sum(when(m, y)).as(s"s_${b(t)}${b(p)}"),
        sum(when(m, 1L).otherwise(0L)).as(s"n_${b(t)}${b(p)}"))
    }
    def b(x: Boolean) = if (x) "1" else "0"
    val cells = Seq(cell(true, true), cell(true, false),
      cell(false, true), cell(false, false))
    def mean(t: Boolean, p: Boolean) =
      when(col(s"n_${b(t)}${b(p)}") > 0,
        round(col(s"s_${b(t)}${b(p)}").cast("double") /
          col(s"n_${b(t)}${b(p)}").cast("double"), 6))
    df.groupBy(col(stratumCol))
      .agg(cells.head._1, cells.head._2 +: cells.tail.flatMap(c =>
        Seq(c._1, c._2)): _*)
      .select(col(stratumCol),
        (col("n_11") + col("n_10") + col("n_01") + col("n_00")).as("n"),
        mean(true, false).as("mean_treat_pre"),
        mean(true, true).as("mean_treat_post"),
        mean(false, false).as("mean_ctrl_pre"),
        mean(false, true).as("mean_ctrl_post"),
        ((mean(true, true) - mean(true, false)) -
          (mean(false, true) - mean(false, false))).as("did"))
  }

  /** DuckDB restatement over `rel(g, treat01, post01, y)`; ends in
    * `did_out(g, n, mean_treat_pre, mean_treat_post, mean_ctrl_pre,
    * mean_ctrl_post, did)`. */
  def estimateSql(rel: String): String = {
    def m(t: Int, p: Int): String =
      s"""CASE WHEN count(*) FILTER
         |      (WHERE treat01 = $t AND post01 = $p) > 0 THEN
         |    round(CAST(sum(CAST(y AS DECIMAL(18,6))) FILTER
         |        (WHERE treat01 = $t AND post01 = $p) AS DOUBLE)
         |      / CAST(count(*) FILTER
         |        (WHERE treat01 = $t AND post01 = $p) AS DOUBLE), 6)
         |  END""".stripMargin
    s"""did_out AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n,
       |    ${m(1, 0)} AS mean_treat_pre,
       |    ${m(1, 1)} AS mean_treat_post,
       |    ${m(0, 0)} AS mean_ctrl_pre,
       |    ${m(0, 1)} AS mean_ctrl_post,
       |    ((${m(1, 1)}) - (${m(1, 0)}))
       |      - ((${m(0, 1)}) - (${m(0, 0)})) AS did
       |  FROM $rel GROUP BY g
       |)""".stripMargin
  }
}

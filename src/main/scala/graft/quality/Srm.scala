package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sample-ratio-mismatch guardrail (Fabijan 2019's "the most useful
  * A/B test check") — before reading ANY metric (q189 t-test, q268
  * CUPED, q278 DiD), verify the assignment itself: a 50/50 split
  * that lands 52/48 at scale means the bucketing is broken and every
  * downstream result is garbage. χ² against the declared ratio with
  * 1 df:
  *
  *   χ² = (n_a − n_b)² / (n_a + n_b)        (for a 50/50 design)
  *
  * Exactness: counts are exact; χ² is one exact-int division; the
  * flag compares against the literal χ²(1df, α=.001) = 10.828 —
  * SRM checks run at strict α because a true mismatch is a BUG, not
  * noise (Fabijan's practice).
  *
  * Scale shape: one conditional-count pass per stratum.
  */
object Srm {

  val Chi2Crit001: Double = 10.827566170662733 // χ²(1), α = .001

  /** Check a 50/50 design per stratum. Returns
    * (stratum, n_a, n_b, chi2, srm_detected). */
  def check(df: DataFrame, stratumCol: String, isB: Column)
      : DataFrame =
    df.groupBy(col(stratumCol))
      .agg(sum(when(isB, 0L).otherwise(1L)).as("n_a"),
        sum(when(isB, 1L).otherwise(0L)).as("n_b"))
      .select(col(stratumCol), col("n_a"), col("n_b"),
        round(((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
          .cast("double") / (col("n_a") + col("n_b")).cast("double"),
          6).as("chi2"),
        (((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
          .cast("double") / (col("n_a") + col("n_b")).cast("double") >
          Chi2Crit001).as("srm_detected"))

  /** DuckDB restatement over `srm_rel(g, isb)` (isb 0/1); ends in
    * `srm_out(g, n_a, n_b, chi2, srm_detected)`. */
  def checkSql: String =
    s"""srm_out AS (
       |  SELECT g, CAST(sum(1 - isb) AS BIGINT) AS n_a,
       |    CAST(sum(isb) AS BIGINT) AS n_b,
       |    round(CAST((sum(1 - isb) - sum(isb))
       |        * (sum(1 - isb) - sum(isb)) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE), 6) AS chi2,
       |    CAST((sum(1 - isb) - sum(isb))
       |        * (sum(1 - isb) - sum(isb)) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE) > $Chi2Crit001
       |      AS srm_detected
       |  FROM srm_rel GROUP BY g
       |)""".stripMargin
}

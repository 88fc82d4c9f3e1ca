package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benjamini–Hochberg false-discovery-rate control (Benjamini &
  * Hochberg 1995) — the multiple-comparisons correction the testing
  * family (q189 Welch, q225 KS, q226 Mann–Whitney, q185 χ²) needs
  * the moment it runs per-segment sweeps: test 50 segments at
  * α = 0.05 and ~2.5 "significant" results are noise; BH's step-up
  * rule bounds the EXPECTED FRACTION of false discoveries instead,
  * which is the operationally right guarantee for metric-anomaly
  * triage.
  *
  * Step-up: sort the m p-values ascending, find the largest k with
  * p_(k) ≤ α·k/m, reject exactly ranks 1..k.
  *
  * Determinism: p-values arrive 9dp-rounded (identical doubles
  * cross-engine); the comparison is the same double chain both
  * sides; rank ties break on the test id. The test LIST is
  * metadata by construction (one row per hypothesis, not per data
  * row), so the global rank window is bounded — the corpus-sized
  * work happened upstream in the tests themselves.
  */
object Fdr {

  /** Normal survival p-value 2·(1−Φ(|z|)) via Abramowitz–Stegun
    * 7.1.26 (|error| < 1.5e-7, far inside the 9dp round): written
    * as ONE fixed Horner chain + one exp, identical in SQL via
    * [[normPSql]].
    */
  def normP(z: Column): Column = {
    val x = abs(z) * lit(0.7071067811865476) // |z|/sqrt(2)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t + lit(-1.453152027)) * t
      + lit(1.421413741)) * t + lit(-0.284496736)) * t
      + lit(0.254829592)) * t
    round(poly * exp(-x * x), 9) // = 2·(1−Φ(|z|)), since
    // erfc(x) = poly·e^(−x²) and p = erfc(|z|/√2)
  }

  /** SQL text of the same chain. */
  def normPSql(zExpr: String): String = {
    val x = s"(abs($zExpr) * 0.7071067811865476)"
    val t = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $t + -1.453152027) * $t" +
      s" + 1.421413741) * $t + -0.284496736) * $t" +
      s" + 0.254829592) * $t)"
    s"round($poly * exp(-$x * $x), 9)"
  }

  /** @param df (test_id, p): one row per hypothesis, p 9dp-rounded.
    * @return (test_id, p, rk, m, rejected) — step-up BH at `alpha`.
    */
  def bh(df: DataFrame, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    val w = Window.orderBy(col("p"), col("test_id")) // m test rows
    val wAll = Window.partitionBy()
    val ranked = df.select(col("test_id"), col("p"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
    val passed = col("p") * col("m").cast("double") <=
      lit(alpha) * col("rk").cast("double")
    ranked
      .withColumn("kstar", max(when(passed, col("rk"))).over(wAll))
      .select(col("test_id"), col("p"), col("rk"), col("m"),
        (col("kstar").isNotNull && col("rk") <= col("kstar"))
          .as("rejected"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (Vovk et al.; Lei et al.
  * 2018) — the distribution-free way to put a COVERAGE GUARANTEE on
  * any point forecaster: hold out a calibration window, take the
  * ⌈(1−α)(n+1)⌉-th smallest absolute residual as the radius, and
  * "forecast ± radius" covers future points with probability ≥ 1−α
  * under exchangeability — no normality assumption, no variance
  * model. Here it wraps [[Ewma.holt]]'s one-step forecasts, turning
  * the q250 smoother into an ALERT BAND with a stated guarantee
  * (the principled version of "flag when 3σ off").
  *
  * Exactness: residuals are exact integers (fixed-point forecast
  * minus fixed-point actual); the radius is an ORDER STATISTIC at
  * integer rank k = ⌈(1−α)(n_cal+1)⌉ (computed by integer
  * arithmetic, clamped to n_cal with the conservative
  * radius-covers-all contract when the calibration set is too small
  * for the level); coverage is one exact division, 9dp.
  *
  * Scale shape: one per-series window over calibration rows
  * (calendar-bounded, the [[Acf]] contract) + one partial-agg
  * rollup. Series scale out; series length is the bounded axis.
  */
object Conformal {

  /** @param df (g, resid, is_cal): series, non-negative integer
    *   residual, calibration-split flag.
    * @param alphaNum/alphaDen miscoverage α (1/10 = 90% target).
    * @return (g, n_cal, n_test, radius, coverage) — coverage of
    *   |resid| ≤ radius over the TEST rows.
    */
  def radiusCoverage(df: DataFrame, alphaNum: Long = 1L,
      alphaDen: Long = 10L): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha in (0,1): $alphaNum/$alphaDen")
    val keep = alphaDen - alphaNum // (1-α) numerator
    val cal = df.filter(col("is_cal"))
    val w = Window.partitionBy("g").orderBy(col("resid"))
    val ranked = cal
      .withColumn("rn", row_number().over(w))
      .withColumn("n_cal",
        count(lit(1)).over(Window.partitionBy("g")))
    // k = ceil((1-α)(n+1)) in integers, clamped to n_cal
    val k = least(
      expr(s"($keep * (n_cal + 1) + ${alphaDen - 1}) div $alphaDen"),
      col("n_cal"))
    val radius = ranked.filter(col("rn") === k)
      .select(col("g"), col("n_cal"), col("resid").as("radius"))
    df.filter(!col("is_cal"))
      .join(radius, "g")
      .groupBy("g")
      .agg(max(col("n_cal")).as("n_cal"), // constants per g
        max(col("radius")).as("radius"),
        count(lit(1)).as("n_test"),
        sum(when(col("resid") <= col("radius"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("g"), col("n_cal"), col("n_test"), col("radius"),
        round(col("n_covered").cast("double") /
          col("n_test").cast("double"), 9).as("coverage"))
  }
}

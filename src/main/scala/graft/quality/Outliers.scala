package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust outlier detection via median/MAD — the monitoring
  * primitive that survives the outliers it is hunting (mean/stddev
  * z-scores are dragged by the very anomalies they should flag; the
  * median and the median-absolute-deviation have 50% breakdown
  * points). Flag x iff |x − median| > k · 1.4826 · MAD, where 1.4826
  * ≈ 1/Φ⁻¹(3/4) makes MAD a consistent σ estimator under normality
  * (Hampel 1974; Leys et al. 2013).
  *
  * Scale: two passes of the exact-quantile harness (Profile
  * .quantiles — two-phase bucketed prefix sums, no single-reducer
  * sort), each reducing to driver scalars; the flagging itself is a
  * pure scan-level predicate. MAD is inherently two-pass (the
  * deviations need the median first) — at 100 TB each pass is one
  * partial-agg'd scan, and a production deployment can swap the
  * exact harness for the percentile_approx sketch the same module
  * already gates.
  */
object Outliers {

  /** Normal-consistency constant 1/Φ⁻¹(0.75). */
  val MadScale = 1.4826

  /** (median, mad) of `valueCol` as exact type-1 quantiles —
    * cross-engine reproducible (= DuckDB quantile_disc 0.5).
    */
  def medianMad(df: DataFrame, valueCol: String): (Double, Double) = {
    val med = Profile.quantiles(df, Seq(valueCol), Seq(0.5))
      .head().getAs[Double]("exact_v")
    val mad = Profile.quantiles(
        df.select(abs(col(valueCol) - med).as("__ad")), Seq("__ad"), Seq(0.5))
      .head().getAs[Double]("exact_v")
    (med, mad)
  }

  /** Input rows + robust-z flag column. `k` is the cutoff in
    * consistent-σ units (3 = the conventional "3 sigma").
    */
  def flag(df: DataFrame, valueCol: String, k: Double = 3.0): DataFrame = {
    val (med, mad) = medianMad(df, valueCol)
    val thr = k * MadScale * mad
    df.withColumn("is_outlier", abs(col(valueCol) - med) > thr)
      .withColumn("median", lit(med))
      .withColumn("mad", lit(mad))
  }
}

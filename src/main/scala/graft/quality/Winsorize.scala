package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Percentile winsorization (the robust-cleaning staple between
  * q102's outlier FLAGGING and dropping rows: clamp the tails so a
  * fat-fingered 10^6 entry stops dragging the mean without losing
  * the row): per group, values clamp to the [pLo, pHi] exact
  * percentiles and the report carries the clamped census + the
  * winsorized mean.
  *
  * Cross-engine exactness: Spark's exact `percentile` and DuckDB's
  * `quantile_cont` share the type-7 linear interpolation (q41's
  * proven equivalence); the bounds are ROUNDED to 6dp before
  * clamping in BOTH engines anyway, so even a last-ulp interpolation
  * wobble cannot flip a boundary row (documented: the clamp is at
  * the 6dp-rounded percentile — still winsorization). Clamped
  * values floor-quantize to cents (q115) so the mean's sum is
  * order-independent BIGINT.
  *
  * Scale shape: exact percentiles are one sort-based aggregate per
  * group (Spark collects each group's values to its reducer — the
  * EXACT-percentile cost, same contract as q102/q103; switch to the
  * KLL sketch q114 when groups outgrow a reducer), bounds join back
  * broadcast (groups-sized), then one partial-aggregated rollup.
  */
object Winsorize {

  /** @return (group, n, n_clamped_lo, n_clamped_hi, lo, hi,
    *         mean_winsorized).
    */
  def report(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"bad percentiles $pLo/$pHi")
    val bounds = df.groupBy(col(groupCol).as("g"))
      .agg(round(expr(s"percentile($valueCol, $pLo)"), 6).as("lo"),
        round(expr(s"percentile($valueCol, $pHi)"), 6).as("hi"))
    val w = least(greatest(col(valueCol), col("lo")), col("hi"))
    df.join(broadcast(bounds), col(groupCol) === col("g"))
      .groupBy(col(groupCol).as("group_key"))
      .agg(count(lit(1)).as("n"),
        count(when(col(valueCol) < col("lo"), 1)).as("n_clamped_lo"),
        count(when(col(valueCol) > col("hi"), 1)).as("n_clamped_hi"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        round(sum(floor(w * lit(100.0) + lit(0.5)).cast("long"))
            .cast("double") / count(lit(1)) / 100.0, 4)
          .as("mean_winsorized"))
  }
}

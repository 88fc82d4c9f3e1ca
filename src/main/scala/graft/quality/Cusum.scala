package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM changepoint detection (Page 1954) over a daily metric
  * series — the SUSTAINED-shift monitor completing q156's spike
  * detector: a one-day spike trips a z-score, but a level shift of
  * half a sigma per day never will; CUSUM accumulates drift until
  * the evidence crosses the alarm threshold.
  *
  * One-sided upward CUSUM against a fixed baseline (the series'
  * first `baselineDays` days): S_t = max(0, S_{t-1} + d_t) with the
  * slack-corrected deviation d_t = x_t − μ_base − κ. The recursion
  * looks inherently sequential, but it has the closed form
  *   S_t = P_t − min(0, min_{j≤t} P_j),   P = prefix sum of d,
  * so it becomes TWO cumulative windows over the series ordering —
  * no recursion, no per-series collect, no UDF.
  *
  * Exactness: totals quantize to integer cents (q156's discipline)
  * and the deviation is computed in BASELINE-SCALED integers,
  * d'_t = B·x_t − SumBase − B·κ (B = baseline day count), so
  * μ_base = SumBase/B never materializes as a rounded double — the
  * prefix sums, running minima, and the alarm compare are exact
  * BIGINT end to end; only the reported s_plus surfaces as one
  * double division.
  *
  * Scale shape: one partial-aggregated daily rollup (the only
  * corpus-sized pass), a series-keyed baseline aggregate joined
  * back, then the two unbounded-preceding windows over
  * |series|·|days| rows — metadata-sized at any corpus scale.
  */
object Cusum {

  /** @param events (series, day, value) — day an integer bucket.
    * @param slackCents κ per day, in cents (drift allowance: daily
    *                   noise below it never accumulates).
    * @param alarmCents alarm threshold h, in cents of accumulated
    *                   excess.
    * @return monitored days (rank > baselineDays) as (series, day,
    *         total, s_plus, alarm); s_plus in display units.
    */
  def upwardShift(events: DataFrame, baselineDays: Int = 7,
      slackCents: Long = 100000L, alarmCents: Long = 200000L): DataFrame = {
    require(baselineDays >= 1, s"baselineDays must be >= 1, got $baselineDays")
    val daily = events.groupBy("series", "day")
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        .as("tq"))
    val ranked = daily.withColumn("rn",
      row_number().over(Window.partitionBy("series").orderBy("day")))
    val base = ranked.filter(col("rn") <= baselineDays)
      .groupBy("series")
      .agg(sum(col("tq")).as("sum_base"), count(lit(1)).as("b"))
    val wCum = Window.partitionBy("series").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.filter(col("rn") > baselineDays)
      .join(broadcast(base), Seq("series"))
      .withColumn("d",
        col("b") * col("tq") - col("sum_base") - col("b") * lit(slackCents))
      .withColumn("p", sum(col("d")).over(wCum))
      .withColumn("s", col("p") - least(min(col("p")).over(wCum), lit(0L)))
      .select(col("series"), col("day"),
        round(col("tq").cast("double") / 100.0, 2).as("total"),
        round(col("s").cast("double") / (col("b") * lit(100.0)), 2)
          .as("s_plus"),
        (col("s") > col("b") * lit(alarmCents)).as("alarm"))
  }
}

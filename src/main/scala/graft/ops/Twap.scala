package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted average over irregular samples (the TWAP every
  * metrics/finance stack computes — a plain AVG over-weights bursts:
  * ten samples in a hot minute must not count ten times a quiet
  * hour's one): each sample's value holds until the NEXT sample in
  * its (series, day), the day's last sample holds to midnight, and
  * the day's average weights each value by its holding duration.
  * Coverage starts at the day's first sample (no cross-day carry —
  * reported as covered_ms so callers can gate thin days).
  *
  * Exactness: values quantize to integer cents and durations are
  * exact ms (q156's discipline), so the weighted numerator is a
  * BIGINT Σ cents·ms — order-independent — and TWAP surfaces as one
  * double division chain written identically in the oracle.
  *
  * Scale shape: one series+day-keyed lead window (per-day sample
  * counts bounded — the metrics contract), then a partial-aggregated
  * rollup. No global sort.
  */
object Twap {

  /** @param events (series, ms, id, value) — id breaks ordering ties
    *               between same-ms samples (the first of a tie holds
    *               for 0 ms; deterministic in both engines).
    * @return (series, day, n_samples, covered_ms, twap).
    */
  def daily(events: DataFrame): DataFrame = {
    val withDay = events.select(col("series"),
      col("ms").cast("long").as("ms"), col("id"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("vq"),
      expr("CAST(ms AS BIGINT) div 86400000").as("day"))
    val w = Window.partitionBy("series", "day").orderBy("ms", "id")
    withDay
      .withColumn("nxt", coalesce(lead(col("ms"), 1).over(w),
        (col("day") + 1) * 86400000L))
      .withColumn("dur", col("nxt") - col("ms"))
      .groupBy("series", "day")
      .agg(count(lit(1)).as("n_samples"),
        sum(col("dur")).as("covered_ms"),
        round(sum(col("vq") * col("dur")).cast("double")
          / sum(col("dur")) / 100.0, 4).as("twap"))
  }
}

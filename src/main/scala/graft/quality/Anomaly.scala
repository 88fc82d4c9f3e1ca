package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metric anomaly detection: trailing-window z-scores over a daily
  * metric series — the monitoring layer on top of the warehouse's
  * aggregates (freshness q14 tells you data ARRIVED; this tells you
  * it arrived WRONG). A day is anomalous when its total sits more
  * than `threshold` standard deviations from the trailing window's
  * mean — the window EXCLUDES the current day, so a spike can't
  * vaccinate itself.
  *
  * Scale shape: one partial-aggregated daily rollup (the only
  * corpus-sized pass), then a series-keyed RANGE window over
  * |series|·|days| rows — metadata-sized at any corpus scale.
  *
  * Exactness: daily totals quantize to integer cents, so window
  * sums and sums-of-squares are exact BIGINT math in any engine;
  * the z formula then runs an identical double-op sequence on those
  * exact integers, surfaced as round(z, 6).
  */
object Anomaly {

  /** @param events (series, day, value) — day an integer bucket.
    * @return (series, day, total, n_ref, z, is_anomaly) — z/flag
    *         null while the trailing window holds < 2 days or has
    *         zero variance.
    */
  def trailingZ(events: DataFrame, windowDays: Int = 7,
      threshold: Double = 3.0): DataFrame = {
    require(windowDays >= 2, s"windowDays must be >= 2, got $windowDays")
    val daily = events.groupBy("series", "day")
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        .as("tq"))
    val w = Window.partitionBy("series").orderBy("day")
      .rangeBetween(-windowDays, -1)
    val stats = daily
      .withColumn("n_ref", count(lit(1)).over(w))
      .withColumn("s", sum(col("tq")).over(w))
      .withColumn("ss", sum(col("tq") * col("tq")).over(w))
    // identical double-op sequence both engines: mean = s/n,
    // var = (ss - s*s/n) / (n-1), z = (tq - mean) / sqrt(var)
    val mean = col("s").cast("double") / col("n_ref")
    val variance = (col("ss").cast("double")
      - col("s").cast("double") * col("s").cast("double") / col("n_ref"))
      ./(col("n_ref") - 1)
    val z = when(col("n_ref") >= 2 && variance > 0,
      round((col("tq").cast("double") - mean) / sqrt(variance), 6))
    stats.select(col("series"), col("day"),
      round(col("tq").cast("double") / 100.0, 2).as("total"),
      col("n_ref"), z.as("z"),
      when(z.isNotNull, abs(z) > threshold).as("is_anomaly"))
  }
}

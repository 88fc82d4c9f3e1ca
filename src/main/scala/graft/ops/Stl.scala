package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** STL-lite trend/seasonal/residual decomposition (Cleveland 1990's
  * decomposition shape with moving-average trend and per-weekday
  * MEDIAN seasonal — the loess-free variant that stays exact):
  * completes the q227 ACF → q228 seasonality → q246 seasonal-anomaly
  * series family with the full three-component split.
  *
  * Integer discipline: every component is carried SCALED instead of
  * divided —
  *   trend_c7     = Σ x over the centered 7-day window   (= 7·trend)
  *   detrend_m7   = 7·x − trend_c7                       (= 7·(x−T))
  *   seasonal_m14 = doubled per-weekday median of detrend_m7
  *                  (lower+upper middle order stats — exact even for
  *                  even counts, no float interpolation)  (= 14·S)
  *   resid_m14    = 14·x − 2·trend_c7 − seasonal_m14     (= 14·R)
  * so x = trend_c7/7 + seasonal_m14/14 + resid_m14/14 holds exactly
  * in the scaled space; NO division ever happens. Edge days (fewer
  * than 7 window rows) report null trend/residual.
  *
  * Scale shape: one per-series ROWS-window pass (the series spine is
  * zero-filled upstream, so ROWS ±3 IS days ±3), one per-(series,
  * weekday) rank window over detrended rows, one bins-sized join
  * back. Windows partition by series key — at 100 TB the parallelism
  * unit is the series, the standard long-panel layout.
  */
object Stl {

  /** Decompose `(gCol, dayCol, xCol)` (x integer, spine gap-free).
    * Returns (g, day, x, trend_c7, seasonal_m14, resid_m14). */
  def decompose(
      df: DataFrame,
      gCol: String,
      dayCol: String,
      xCol: String): DataFrame = {
    val g = col(gCol)
    val series = Window.partitionBy(g).orderBy(col(dayCol))
      .rowsBetween(-3, 3)
    val base = df.select(g.as("g"), col(dayCol).as("day"),
        col(xCol).cast("long").as("x"))
      .withColumn("w_n", count(lit(1)).over(
        Window.partitionBy(g).orderBy(col("day")).rowsBetween(-3, 3)))
      .withColumn("trend_c7",
        when(col("w_n") === 7, sum(col("x")).over(series)))
      .withColumn("detrend_m7",
        when(col("trend_c7").isNotNull, col("x") * 7 - col("trend_c7")))
      .withColumn("wd", pmod(col("day"), lit(7)))
    // doubled median per (g, weekday) over non-null detrended rows:
    // lower + upper middle of the (detrend, day)-ordered ranks
    val inWd = Window.partitionBy(col("g"), col("wd"))
      .orderBy(col("detrend_m7"), col("day"))
    val ranked = base.filter(col("detrend_m7").isNotNull)
      .withColumn("rn", row_number().over(inWd))
      .withColumn("k", count(lit(1)).over(
        Window.partitionBy(col("g"), col("wd"))))
    val med = ranked
      .groupBy("g", "wd")
      .agg((sum(when(col("rn") === expr("(k + 1) div 2"),
          col("detrend_m7")).otherwise(0L)) +
        sum(when(col("rn") === expr("k div 2 + 1"),
          col("detrend_m7")).otherwise(0L))).as("seasonal_m14"))
    base.join(med, Seq("g", "wd"), "left")
      .select(col("g").as(gCol), col("day"), col("x"),
        col("trend_c7"),
        when(col("trend_c7").isNotNull, col("seasonal_m14"))
          .as("seasonal_m14"),
        when(col("trend_c7").isNotNull,
          col("x") * 14 - col("trend_c7") * 2 - col("seasonal_m14"))
          .as("resid_m14"))
  }

  /** DuckDB restatement over `daily(g, day, x)`; ends in
    * `stl_out(g, day, x, trend_c7, seasonal_m14, resid_m14)`. */
  def decomposeSql: String =
    """stl_base AS (
      |  SELECT g, day, x,
      |    CASE WHEN count(*) OVER w7 = 7 THEN
      |      CAST(sum(x) OVER w7 AS BIGINT) END AS trend_c7,
      |    day % 7 AS wd
      |  FROM daily
      |  WINDOW w7 AS (PARTITION BY g ORDER BY day
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      |), stl_det AS (
      |  SELECT g, day, x, trend_c7, wd,
      |    CASE WHEN trend_c7 IS NOT NULL
      |      THEN x * 7 - trend_c7 END AS detrend_m7
      |  FROM stl_base
      |), stl_rank AS (
      |  SELECT g, wd, detrend_m7,
      |    row_number() OVER (PARTITION BY g, wd
      |      ORDER BY detrend_m7, day) AS rn,
      |    count(*) OVER (PARTITION BY g, wd) AS k
      |  FROM stl_det WHERE detrend_m7 IS NOT NULL
      |), stl_med AS (
      |  SELECT g, wd,
      |    CAST(sum(CASE WHEN rn = (k + 1) // 2 THEN detrend_m7
      |        ELSE 0 END)
      |      + sum(CASE WHEN rn = k // 2 + 1 THEN detrend_m7
      |        ELSE 0 END) AS BIGINT) AS seasonal_m14
      |  FROM stl_rank GROUP BY g, wd
      |), stl_out AS (
      |  SELECT b.g, b.day, b.x, b.trend_c7,
      |    CASE WHEN b.trend_c7 IS NOT NULL
      |      THEN m.seasonal_m14 END AS seasonal_m14,
      |    CASE WHEN b.trend_c7 IS NOT NULL
      |      THEN b.x * 14 - b.trend_c7 * 2 - m.seasonal_m14 END
      |      AS resid_m14
      |  FROM stl_det b LEFT JOIN stl_med m
      |    ON b.g = m.g AND b.wd = m.wd
      |)""".stripMargin
}

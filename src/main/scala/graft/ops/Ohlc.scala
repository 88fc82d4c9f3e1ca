package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OHLC candle aggregation — the metrics/finance rollup (open, high,
  * low, close per bucket) that looks trivial until first/last: a
  * bare `first()` is partition-order-dependent in Spark. Here open
  * and close ride lexicographic MIN/MAX over (ms, id, value)
  * structs — the (time, tie-break id) total order decides, the
  * value tags along — which both engines implement identically
  * (struct comparison is field-order lexicographic). One
  * partial-aggregatable pass: struct min/max combine like any
  * min/max, so candles build map-side and merge associatively at
  * any scale, unlike a sort-based windowed first/last.
  */
object Ohlc {

  /** @param df (series, bucket, ms, id, value) — id breaks ms ties.
    * @return (series, bucket, n_points, open, high, low, close).
    */
  def candles(df: DataFrame): DataFrame = {
    def tagged: Column = struct(col("ms").as("ms"), col("id").as("id"),
      col("value").as("v"))
    df.groupBy("series", "bucket")
      .agg(count(lit(1)).as("n_points"),
        min(tagged).getField("v").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(tagged).getField("v").as("close"))
  }
}

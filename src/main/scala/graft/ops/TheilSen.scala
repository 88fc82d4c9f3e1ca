package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theil–Sen robust trend estimator (Theil 1950; Sen 1968) — the
  * median of all pairwise slopes, the robust companion to
  * [[graft.quality.TrendOls]]-style least squares (q176): one
  * outlier day can drag an OLS slope arbitrarily far, while
  * Theil–Sen tolerates up to ~29% contamination — the right trend
  * readout for operational metrics where a single bad scrape or
  * backfill spike is routine.
  *
  * Exactness: each pairwise slope is ONE double division of exact
  * integers (identical cross-engine); the median is an ORDER
  * STATISTIC — the value at positions ⌈m/2⌉ / ⌈(m+1)/2⌉ of the
  * sorted slope multiset, well-defined under ties regardless of
  * tie order (row_number among equal VALUES picks an arbitrary row
  * but the value at rank k is the same), averaged for even m.
  *
  * Scale shape: the O(n²) pair join runs PER SERIES on
  * calendar-bounded series (the [[Acf]] contract — n days, not
  * corpus rows): one keyed self-join, one per-series window over
  * n(n−1)/2 slope rows. Series count scales out; series length is
  * the bounded dimension. For multi-year series swap the exact
  * median for a per-series KLL sketch — same join, bounded state.
  */
object TheilSen {

  /** @param df (g, x, y): series key, integer x (e.g. epoch day),
    *   integer y (e.g. cents).
    * @return (g, n_points, n_pairs, slope) — slope in y-units per
    *   x-unit, 9dp.
    */
  def slope(df: DataFrame): DataFrame = {
    val base = df.select(col("g"), col("x").cast("long"),
      col("y").cast("long"))
    val a = base.select(col("g"), col("x").as("x1"), col("y").as("y1"))
    val b = base.select(col("g"), col("x").as("x2"), col("y").as("y2"))
    val pairs = a.join(b, Seq("g")).filter(col("x1") < col("x2"))
      .select(col("g"),
        ((col("y2") - col("y1")).cast("double") /
          (col("x2") - col("x1")).cast("double")).as("s"))
    val w = Window.partitionBy("g").orderBy("s")
    val ranked = pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("g")))
    val mid = ranked.filter(
      col("rn") === expr("(m + 1) div 2") ||
        col("rn") === expr("(m + 2) div 2"))
    val n = base.groupBy("g").agg(count(lit(1)).as("n_points"))
    mid.groupBy("g")
      .agg(max(col("m")).as("n_pairs"),
        round(avg(col("s")), 9).as("slope"))
      .join(n, "g")
      .select(col("g"), col("n_points"), col("n_pairs"), col("slope"))
  }
}

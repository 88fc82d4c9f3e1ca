package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: points ⋈ intervals with
  * start ≤ point < end — the other canonical operator Spark lacks a
  * native form for (a raw non-equi join plans as a broadcast/cartesian
  * nested loop).
  *
  * Scale path: BINNING. Each interval explodes to the fixed-width
  * bins it overlaps; points compute their bin — the join becomes an
  * EQUI-join on bin plus an exact containment filter. Cost is
  * linear: |intervals| × (avg_len / binWidth) exploded rows and a
  * hash shuffle on bin, instead of |points| × |intervals|. Pick
  * binWidth ≈ median interval length; degenerate long intervals cost
  * more bins (cap/split upstream, same discipline as dedup buckets).
  */
object RangeJoin {

  /** @param points    frame with `pointCol` (numeric, e.g. epoch ms)
    * @param intervals frame with `startCol`/`endCol` (same scale);
    *                  [start, end) half-open
    * @param binWidth  bin size in the same units
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedIntervals = intervals.withColumn("__bin",
      explode(sequence(
        (col(startCol) / binWidth).cast("long"),
        // end is exclusive: the bin of (end - 1)
        ((col(endCol) - 1) / binWidth).cast("long"))))
    val binnedPoints = points.withColumn("__bin",
      (col(pointCol) / binWidth).cast("long"))
    binnedPoints.join(binnedIntervals, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the lakehouse file-skipping
  * primitive (Delta OPTIMIZE ZORDER BY / Iceberg sort orders; Morton
  * 1966). Rows clustered by the bit-interleave of their dimension
  * bucket indices land so that a file's min/max RANGES on BOTH
  * columns stay narrow — a box predicate then prunes most files from
  * the scan, which at 100 TB is the difference between reading
  * everything and reading a few percent.
  *
  * Everything here is deterministic and closed-form — fixed-bound
  * bucketing from a global min/max aggregate and a bit-prefix
  * partition id — NOT `repartitionByRange` (whose sampled boundaries
  * differ run to run and cannot be stated by a cross-engine oracle).
  * One pass computes the stats, one shuffle lays the data out.
  */
object ZOrder {

  /** Fixed-bound bucket index in [0, buckets): floor((v − lo)·buckets
    * / (hi − lo + 1e-9)). The epsilon keeps v = hi inside the last
    * bucket; plain IEEE double arithmetic, so an engine recomputing
    * it from the same bounds gets the same bucket.
    */
  def bucket(v: Column, lo: Double, hi: Double, buckets: Int): Column =
    floor(((v.cast("double") - lit(lo)) * lit(buckets.toDouble)) /
      ((lit(hi) - lit(lo)) + lit(1e-9))).cast("long")

  /** Morton interleave of two `bits`-bit bucket indices: bit b of x
    * lands at 2b, bit b of y at 2b+1. Plain shift/mask arithmetic —
    * codegen'd, and restatable verbatim in any SQL engine.
    */
  def z2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "1..31 bits per dimension")
    (0 until bits).map { b =>
      val xb = shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b)
      val yb = shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
      xb + yb
    }.reduce(_ + _)
  }

  /** The same interleave as SQL text (for oracle statements). */
  def z2Sql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")

  /** Cluster `df` on the z-value of (xCol, yCol): adds `zv` and the
    * bit-prefix partition id `pid` (top `partitionBits` of the
    * 2·bits z-value ⇒ 2^partitionBits files). Callers write with
    * `.repartition(col("pid")).sortWithinPartitions("zv")` +
    * `partitionBy("pid")` — one shuffle, layout done.
    */
  def assign(df: DataFrame, xCol: String, yCol: String,
      xLo: Double, xHi: Double, yLo: Double, yHi: Double,
      bits: Int, partitionBits: Int): DataFrame = {
    require(partitionBits >= 1 && partitionBits <= 2 * bits,
      "partition bits must fit in the z-value")
    val buckets = 1 << bits
    val zv = z2(bucket(col(xCol), xLo, xHi, buckets),
      bucket(col(yCol), yLo, yHi, buckets), bits)
    df.withColumn("zv", zv)
      .withColumn("pid", shiftright(col("zv"), 2 * bits - partitionBits))
  }

  /** 1-D total-order layout (the plain ORDER BY clustering — Delta
    * OPTIMIZE ... ZORDER BY a single column degenerates to this;
    * Iceberg calls it a sort order): deterministic fixed-bound range
    * partitions from the same `bucket` arithmetic, so the file
    * boundaries are a pure function of (lo, hi, partitions) — unlike
    * `repartitionByRange`, whose sampled boundaries move run to run.
    * Callers write with `.repartition(col("pid"))
    * .sortWithinPartitions(vCol)` + `partitionBy("pid")`: one
    * shuffle, and consecutive files carry disjoint, increasing value
    * ranges — a range predicate then prunes to the few files whose
    * [min,max] it intersects.
    */
  def assignSorted(df: DataFrame, vCol: String,
      lo: Double, hi: Double, partitions: Int): DataFrame =
    df.withColumn("pid", bucket(col(vCol), lo, hi, partitions))

  /** Per-file (= per-pid) skipping index over the laid-out data: the
    * min/max ranges a scan planner consults, plus whether a box
    * predicate on (xCol, yCol) would have to scan the file.
    */
  def skippingStats(laid: DataFrame, xCol: String, yCol: String,
      boxXLo: Double, boxXHi: Double, boxYLo: Double, boxYHi: Double): DataFrame =
    laid.groupBy(col("pid").cast("long").as("pid"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
      .withColumn("would_scan",
        !(col("x_max") < boxXLo || col("x_min") > boxXHi ||
          col("y_max") < boxYLo || col("y_min") > boxYHi))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared two-phase range-bucket prefix scan — THE engine-wide
  * answer to "global running total / dense rank over a data-sized
  * table" (VERDICT r13 item 1: this shape previously lived as three
  * independent copies in ml/Eval, ops/Packing and ops/SurrogateKeys,
  * with text/VocabCoverage still running the naive single-reducer
  * window it replaces).
  *
  * Why not `Window.orderBy(...)` with no partition: Spark plans that
  * as ONE task holding the entire ordered table — the canonical
  * "works on 60k rows, dies on 100 TB" trap. The two-phase shape is
  * bit-identical to the naive window (every oracle restates the naive
  * form) while no task ever sees more than one bucket:
  *
  *   1. rows carry a bucket key MONOTONE in the target order
  *      ([[rangeBucket]] derives one from any numeric column; callers
  *      with structural keys — id ranges, leading bytes — supply
  *      their own). Monotone means order-consistent, so ANY bucket
  *      granularity yields identical prefix sums.
  *   2. per-(partCols, bucket) partial sums prefix-scan into base
  *      offsets — a window over a METADATA-sized table (≤ nBuckets
  *      rows per partition key), broadcast back;
  *   3. each row's exclusive prefix = base + intra-bucket exclusive
  *      sum, a window PARTITIONED by (partCols, bucket).
  */
object PrefixSum {

  /** Attach a range-bucket column monotone in `score`'s numeric
    * order, with the null/NaN/±Inf routing contract the Eval rank
    * stats pinned (and ADVICE r13 hardened):
    *
    *  - null  → bucket −1 (sorts with Spark's null placement: first
    *    under an asc bucket scan, last under desc — matching the
    *    naive window's null ordering on both scan directions);
    *  - −Inf  → bucket 0, +Inf and NaN → bucket nBuckets−1,
    *    EXPLICITLY: ±Inf is excluded from the bounds aggregate (an
    *    infinite bound would make the width infinite and funnel every
    *    finite score into one bucket — the single-reducer shape this
    *    exists to avoid) and floor((±Inf−lo)/w) / floor((NaN−lo)/w)
    *    are not trustworthy arithmetic. NaN ordering GREATER than
    *    +Inf (both engines) is preserved by the intra-bucket sort.
    *  - finite → floor((s−lo)/width) clamped to [0, nBuckets−1]:
    *    subtraction and division by a positive constant are monotone
    *    in IEEE, so bucket order agrees with score order.
    *
    * The bounds ride a broadcast 1-row crossJoin, so building the
    * plan stays LAZY — no job fires until the caller executes.
    */
  def rangeBucket(df: DataFrame, score: Column, nBuckets: Int,
      out: String): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val sd = score.cast("double")
    val inf = lit(Double.PositiveInfinity)
    val sdFin = when(isnan(sd) || sd === inf || sd === -inf, lit(null))
      .otherwise(sd)
    val bounds = df.agg(min(sdFin).as("__pslo"), max(sdFin).as("__pshi"))
    val width = when(col("__pshi") > col("__pslo"),
      (col("__pshi") - col("__pslo")) / nBuckets).otherwise(lit(1.0))
    val bucket = when(sd.isNull, lit(-1L))
      .when(sd === -inf, lit(0L))
      .when(isnan(sd) || sd === inf, lit(nBuckets - 1L))
      .otherwise(least(greatest(
        floor((sd - coalesce(col("__pslo"), lit(0.0))) / width), lit(0L)),
        lit(nBuckets - 1L)))
    df.crossJoin(broadcast(bounds))
      .withColumn(out, bucket)
      .drop("__pslo", "__pshi")
  }

  /** Exclusive prefix sums of each `vals` expression over the global
    * (partCols, orderIntra) order, using `bucketCol` as the monotone
    * bucket key — one offs aggregate and one bucket-partitioned
    * window regardless of how many sums ride along (VocabCoverage
    * takes its rank AND its cumulative count in a single pass).
    *
    * Contract: `bucketCol` must be order-consistent with
    * `orderIntra` within each partCols group — b(x) < b(y) for x
    * before y, never the reverse (equal is fine; that is what the
    * intra window resolves). `bucketDesc` flips the bucket scan for
    * descending orders — the caller flips `orderIntra` to match.
    * The offs join is NULL-SAFE on (partCols, bucket): a null
    * stratum is a legitimate group, and the naive window treats null
    * as a partition value — a plain equi-join would silently drop
    * its rows. Sums are LONG arithmetic (cast `vals` accordingly).
    */
  def cumBefore(df: DataFrame, partCols: Seq[String], bucketCol: String,
      bucketDesc: Boolean, orderIntra: Seq[Column],
      vals: Seq[(Column, String)]): DataFrame = {
    require(vals.nonEmpty, "cumBefore needs at least one value column")
    require(orderIntra.nonEmpty, "cumBefore needs an intra-bucket order")
    val bCol = if (bucketDesc) col(bucketCol).desc else col(bucketCol).asc
    val valAggs = vals.zipWithIndex.map { case ((v, _), i) =>
      sum(v).as(s"__psn$i")
    }
    val offs = vals.indices.foldLeft(
      df.groupBy((partCols :+ bucketCol).map(col): _*)
        .agg(valAggs.head, valAggs.tail: _*)) { (d, i) =>
      d.withColumn(s"__psbase$i",
        coalesce(sum(col(s"__psn$i")).over(
          Window.partitionBy(partCols.map(col): _*).orderBy(bCol)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    }.drop(vals.indices.map(i => s"__psn$i"): _*)
    val keys = partCols :+ bucketCol
    val o0 = keys.foldLeft(offs)((d, c) =>
      d.withColumnRenamed(c, "__pso_" + c))
    // unkeyed offs is ≤ nBuckets rows — broadcast; keyed offs is
    // strata × buckets (metadata-sized only per stratum) — let the
    // planner pick (AQE broadcasts it when small)
    val o = if (partCols.isEmpty) broadcast(o0) else o0
    val cond = keys.map(c => col(c) <=> col("__pso_" + c)).reduce(_ && _)
    val joined = df.join(o, cond)
      .drop(keys.map("__pso_" + _): _*)
    val intra = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderIntra: _*).rowsBetween(Window.unboundedPreceding, -1)
    vals.zipWithIndex.foldLeft(joined) { case (d, ((v, outName), i)) =>
      d.withColumn(outName,
        col(s"__psbase$i") + coalesce(sum(v).over(intra), lit(0L)))
    }.drop(vals.indices.map(i => s"__psbase$i"): _*)
  }
}

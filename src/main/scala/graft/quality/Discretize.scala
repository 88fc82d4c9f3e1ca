package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equal-frequency discretization (quantile binning) — the
  * feature-engineering staple that turns a skewed numeric column
  * into B roughly-equal-population ordinal bins (decision-tree
  * preprocessing, score bucketing, monotonic-feature encoding).
  * Fit-then-transform like q105's scaler: FIT computes the B−1
  * interior cut points per group as exact percentiles; TRANSFORM
  * assigns bin = #{cuts strictly below the value} via a codegen'd
  * sum of comparisons against the broadcast bounds.
  *
  * Cross-engine exactness: cuts use Spark's exact `percentile` ≡
  * DuckDB `quantile_cont` (q41's type-7 equivalence) ROUNDED 6dp
  * before any comparison, so a last-ulp interpolation wobble cannot
  * flip a boundary row (q177's discipline). Heavy ties can make
  * adjacent cuts equal — the bin between them is then empty in both
  * engines (documented equal-frequency caveat, not a bug).
  *
  * Scale shape: exact percentiles are one sort-based aggregate per
  * group (the EXACT-percentile reducer-per-group contract of
  * q102/q103/q177; swap in the q114 KLL sketch when a group outgrows
  * a reducer), bounds broadcast back (groups-sized), bin assignment
  * is a pure scan projection, and the census is one
  * partial-aggregated groupBy.
  */
object Discretize {

  /** Per-(group, bin) census with the enclosing rounded cut points;
    * open extremes carry null bounds.
    *
    * @return (group_key, bin, n_rows, lo_bound, hi_bound)
    */
  def report(df: DataFrame, groupCol: String, valueCol: String,
      nBins: Int = 4): DataFrame = {
    require(nBins >= 2 && nBins <= 64, s"nBins must be in [2,64], got $nBins")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    // internal alias kept out of any plausible caller namespace
    val gk = "__disc_g"
    val cuts = df.groupBy(col(groupCol).as(gk))
      .agg(expr(s"percentile($valueCol, array(${probs.mkString(",")}))")
        .as("cuts"))
      .select(col(gk),
        array((1 to nBins - 1).map(i =>
          round(element_at(col("cuts"), i), 6)): _*).as("rcuts"))
    val bin: Column = (1 to nBins - 1)
      .map(i => (col(valueCol) > element_at(col("rcuts"), i)).cast("int"))
      .reduce(_ + _)
    df.join(broadcast(cuts), col(groupCol) === col(gk))
      .withColumn("bin", bin)
      .withColumn("lo_bound",
        when(col("bin") > 0, element_at(col("rcuts"), col("bin"))))
      .withColumn("hi_bound",
        when(col("bin") < nBins - 1,
          element_at(col("rcuts"), col("bin") + 1)))
      .groupBy(col(groupCol).as("group_key"), col("bin"),
        col("lo_bound"), col("hi_bound"))
      .agg(count(lit(1)).as("n_rows"))
      .select("group_key", "bin", "n_rows", "lo_bound", "hi_bound")
  }
}

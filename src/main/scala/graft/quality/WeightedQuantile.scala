package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact WEIGHTED percentiles per group — the missing sibling of
  * q103's unweighted group percentiles: "the median price per
  * shipped UNIT" weights every row by its quantity, and collapsing
  * to row-level percentiles silently over-weights small lines.
  * (Sketch-world offers no exact shortcut: this is the
  * sorted-cumulative-weight definition computed directly.)
  *
  * Definition (lower weighted percentile, inclusive): wp_p = the
  * smallest value v whose inclusive cumulative weight reaches p% of
  * the group total, rows ordered by (value, id). With INTEGER
  * weights the test is exact integer arithmetic
  * (100·cumw ≥ p·total) — no interpolation, no floats; the reported
  * percentile is an actual data value carried through untouched, so
  * cross-engine parity is structural.
  *
  * Scale shape: one group-keyed cumulative window + one
  * partial-aggregated rollup (min-over-CASE per requested
  * percentile). Each group sorts on its own reducer — the exact-
  * percentile contract of q102/q103/q177; swap to q114's KLL (with
  * row-expansion by weight or a weighted sketch) when a single group
  * outgrows a reducer.
  */
object WeightedQuantile {

  /** @param df (g, v, w, id) — group, value, non-negative integer
    *   weight, deterministic tie-break id.
    * @param percents integer percents in (0, 100].
    * @return (g, total_weight, wp_<p>...) one row per group.
    */
  def report(df: DataFrame, percents: Seq[Int] = Seq(25, 50, 75)): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100),
      s"percents must be in (0,100], got $percents")
    val byG = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val cum = sum(col("w")).over(byG.rowsBetween(Window.unboundedPreceding, 0))
    val tot = sum(col("w")).over(Window.partitionBy("g"))
    val staged = df
      .withColumn("cw", cum)
      .withColumn("tw", tot)
    val wps = percents.map(p =>
      min(when(col("cw") * 100 >= col("tw") * p, col("v"))).as(s"wp$p"))
    staged.groupBy("g")
      .agg(max(col("tw")).as("total_weight"), wps: _*)
  }
}

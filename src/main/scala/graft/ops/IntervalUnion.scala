package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key union of overlapping intervals (the gaps-and-islands
  * merge): total covered time, island count, and the largest island
  * — the primitive behind session coverage, machine uptime, ad
  * exposure, and SLA credit math, where naive SUM(end−start)
  * double-counts every overlap.
  *
  * Method: within each key, order intervals by (start, end, id) and
  * compare each start against the running max of PRIOR ends
  * (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING). A start strictly
  * beyond that max opens a new island; the island id is the running
  * sum of those breaks; islands then aggregate to (min start,
  * max end). All arithmetic is integer epoch-ms — exact, no floats
  * anywhere.
  *
  * Touching intervals ([a,b) then [b,c)) MERGE: the break test is
  * strict `start > max_prior_end`, matching half-open semantics
  * (coverage b..b is empty, so there is no gap).
  *
  * Scale shape: both windows and both aggregations are KEYED on the
  * interval key — partitions are per-key island chains, never a
  * global sort. Skewed keys (one user with millions of intervals)
  * are a single-reducer contract like every per-key window in this
  * repo (q102/q148); cap or pre-split upstream if a key can outgrow
  * a reducer.
  */
object IntervalUnion {

  /** @param df (key, start, end, id) — id breaks ordering ties.
    * @return (key, n_intervals, n_islands, covered, longest_island)
    *   in the same integer units as start/end.
    */
  def coverage(df: DataFrame): DataFrame = {
    val byKey = Window.partitionBy("key")
      .orderBy(col("start"), col("end"), col("id"))
    val priorEnd = max(col("end"))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val islands = df
      .withColumn("brk",
        when(col("start") > coalesce(priorEnd, lit(Long.MinValue)), 1L)
          .otherwise(0L))
      // first row of a key has no prior → brk 1; island ids are the
      // 1-based running break count
      .withColumn("island",
        sum(col("brk")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("key", "island")
      .agg(count(lit(1)).as("n_iv"),
        min(col("start")).as("s"), max(col("end")).as("e"))
    islands.groupBy("key")
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("e") - col("s")).as("covered"),
        max(col("e") - col("s")).as("longest_island"))
  }
}

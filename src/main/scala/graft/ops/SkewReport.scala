package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-key skew report — the "should I salt this join" advisor
  * that closes the loop on q50/q157's salting mechanics: before
  * keying a 100 TB shuffle on a column, ask what fraction of rows
  * the heaviest keys carry. A top-1 share ≫ 1/shufflePartitions
  * means one reducer owns that share of the work — salt (q157),
  * AQE-split, or broadcast instead.
  *
  * Scale shape: one partial-aggregatable key census (8-byte keys,
  * map-side combine absorbs the hot key), the top-k via
  * ORDER+LIMIT — planned as TakeOrdered (per-partition heaps, k-row
  * driver merge, q161's precedent), never a global sort; totals are
  * one bounded driver scalar; the rank window runs on k rows.
  */
object SkewReport {

  /** @return top-k keys as (rank, key, n_rows, share) plus
    *         n_total/n_distinct on every row for context.
    */
  def topKeys(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val census = graft.plans.Plans.barrier(
      df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n_rows")))
    val t = census.agg(sum(col("n_rows")), count(lit(1))).head()
    val total = if (t.isNullAt(0)) 0L else t.getLong(0)
    require(total > 0, "topKeys: empty input")
    val top = census.orderBy(col("n_rows").desc, col("key")).limit(k)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_rows").desc, col("key"))))
      .select(col("rank"), col("key"), col("n_rows"),
        round(col("n_rows").cast("double") / lit(total.toDouble), 9)
          .as("share"),
        lit(total).as("n_total"), lit(t.getLong(1)).as("n_distinct"))
  }
}

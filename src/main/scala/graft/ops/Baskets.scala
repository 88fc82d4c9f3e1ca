package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over item baskets (Agrawal–Srikant 1994's
  * support/confidence/lift, at the pair level — the co-occurrence
  * analysis behind "frequently bought together" and warehouse
  * affinity reports). A basket is a SET of items (duplicate lines
  * collapse); for item pairs a < b:
  *   support    = n_ab / N           (fraction of baskets with both)
  *   confidence = n_ab / n_a         (a → b)
  *   lift       = n_ab·N / (n_a·n_b) (>1 ⇒ positive association)
  *
  * Scale shape: pair generation is a basket-keyed self-join — the
  * same bounded-group contract as the funnel/CEP family (a basket
  * holds a handful of items; a degenerate million-item basket is a
  * data bug, not a workload). Pair counts partial-aggregate on
  * 16-byte keys; item counts are an items-sized aggregate joined
  * back broadcast; N is one scalar. Output ∝ pairs above minCount —
  * the Zipf tail (n_ab = 1, the bulk) dies in the HAVING before any
  * join-back.
  *
  * Exactness: all counts exact BIGINT; the three ratios are single
  * exact-integer→double divisions rounded at 9dp (cross-engine safe
  * away from representable .5e-9 boundaries, the family rule).
  */
object Baskets {

  /** @param df (basketCol, itemCol) rows — duplicates collapse.
    * @return (item_a, item_b, n_ab, n_a, n_b, support, confidence,
    *         lift) for pairs with n_ab >= minCount.
    */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minCount: Long = 2L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val items = graft.plans.Plans.barrier(
      df.select(col(basketCol).as("bk"), col(itemCol).as("it")).distinct())
    val n = items.select(col("bk")).distinct().count()
    require(n > 0, "pairRules: no baskets")
    val itemCounts = items.groupBy(col("it")).agg(count(lit(1)).as("n_i"))
    val pairCounts = items.alias("x").join(items.alias("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("item_a"), col("y.it").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairCounts
      .join(broadcast(itemCounts.select(col("it").as("item_a"),
        col("n_i").as("n_a"))), Seq("item_a"))
      .join(broadcast(itemCounts.select(col("it").as("item_b"),
        col("n_i").as("n_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / lit(n.toDouble), 9).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 9).as("confidence"),
        round((col("n_ab") * lit(n)).cast("double") / (col("n_a") * col("n_b")),
          9).as("lift"))
  }
}

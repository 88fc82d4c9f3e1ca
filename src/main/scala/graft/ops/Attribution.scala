package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-attribution credit assignment (first-touch /
  * last-touch): for every conversion, find the first and the last
  * touch the same user made strictly BEFORE it (in (time, event_id)
  * order) and credit its channel. The product-analytics staple next
  * to funnels (q95) and retention (q141); reference anchor: the
  * event-stream models the warehouse exposes.
  *
  * Scale shape: ONE exchange — a single window partitioned by user
  * over the merged touch/conversion stream, with running
  * first/last-non-null channel carried by rows-frame window
  * functions (never a per-conversion join back into the touch
  * history, which would be a corpus×corpus range join). The census
  * after it is partial-aggregated and models×channels-sized.
  *
  * Determinism: the window orders by (ms, event_id) — a total order —
  * and "before" is the ROWS frame [unbounded, -1], so a touch tied
  * on ms with a conversion counts iff its event_id is smaller,
  * identically in any engine.
  */
object Attribution {

  /** @param events (event_id, user_id, ms, channel, is_conversion,
    *               value) — `channel` must be null on conversion rows.
    * @return (model, channel, n_conv, sum_value): model ∈
    *         {first_touch, last_touch}, channel "(none)" for
    *         conversions with no prior touch.
    */
  def credit(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // barrier: both model legs consume this frame — without the cut
    // the corpus-sized sort + window would run once per leg (the
    // materialized slice is conversions-only, the small side)
    val attributed = graft.plans.Plans.barrier(events
      .withColumn("first_ch", first(col("channel"), ignoreNulls = true).over(w))
      .withColumn("last_ch", last(col("channel"), ignoreNulls = true).over(w))
      .filter(col("is_conversion"))
      .select("first_ch", "last_ch", "value"))
    Seq(("first_touch", "first_ch"), ("last_touch", "last_ch"))
      .map { case (model, ch) =>
        attributed.groupBy(
            lit(model).as("model"),
            coalesce(col(ch), lit("(none)")).as("channel"))
          .agg(count(lit(1)).as("n_conv"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
      }
      .reduce(_ unionByName _)
  }

  /** Position-based (U-shaped) multi-touch attribution — the model
    * between first/last (all-or-nothing) and linear (flat): each
    * conversion splits credit 40% / 20% / 40% across first / middle
    * / last prior touches. Credit is INTEGER basis points so the
    * split is exact: 1 touch → 10000, 2 → 5000+5000, n≥3 → first
    * 4000 (+ the 2000 mod (n−2) remainder, deterministically), last
    * 4000, each middle 2000 div (n−2). Credited value rides
    * cents×bp BIGINT sums — order-independent, one final division.
    *
    * Scale shape: unlike first/last (one window), every conversion
    * must see ALL its prior touches — a user-keyed touches×convs
    * join under the funnel-family bounded-per-user contract, then
    * per-conversion windows over bounded groups. Conversions with
    * no prior touch credit "(none)" in full.
    *
    * @param events shape of [[credit]].
    * @return (channel, n_credits, total_bp, credited_value).
    */
  def positionCredit(events: DataFrame): DataFrame = {
    val touches = events.filter(!col("is_conversion"))
      .select(col("user_id"), col("ms").as("t_ms"),
        col("event_id").as("t_id"), col("channel"))
    val convs = events.filter(col("is_conversion"))
      .select(col("user_id"), col("ms").as("c_ms"),
        col("event_id").as("c_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
    val j = touches.join(convs, Seq("user_id"))
      .filter(col("t_ms") < col("c_ms") ||
        (col("t_ms") === col("c_ms") && col("t_id") < col("c_id")))
    val byConv = Window.partitionBy("user_id", "c_id")
    val ranked = j
      .withColumn("rn",
        row_number().over(byConv.orderBy(col("t_ms"), col("t_id"))))
      .withColumn("n", count(lit(1)).over(byConv))
    val bp = when(col("n") === 1, lit(10000L))
      .when(col("n") === 2, lit(5000L))
      .when(col("rn") === 1,
        lit(4000L) + expr("2000 % (n - 2)"))
      .when(col("rn") === col("n"), lit(4000L))
      .otherwise(expr("2000 div (n - 2)"))
    val credited = ranked.withColumn("bp", bp)
      .groupBy("channel")
      .agg(count(lit(1)).as("n_credits"),
        sum(col("bp")).as("total_bp"),
        round(sum(col("cents") * col("bp")).cast("double") / 1e6, 6)
          .as("credited_value"))
    val untouched = convs
      .join(j.select("user_id", "c_id").distinct(),
        Seq("user_id", "c_id"), "left_anti")
      .groupBy(lit("(none)").as("channel"))
      .agg(count(lit(1)).as("n_credits"),
        (count(lit(1)) * 10000L).as("total_bp"),
        round((sum(col("cents")) * 10000L).cast("double") / 1e6, 6)
          .as("credited_value"))
    credited.unionByName(untouched)
  }
}

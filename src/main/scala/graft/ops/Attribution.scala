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
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based event sessionization (batch form).
  *
  * Classic lag+cumsum: a session opens when the gap to the previous
  * event of the same user exceeds `gapNs`. One shuffle on user_id;
  * both window functions share the same partitioning so Catalyst
  * plans a single Exchange + Sort.
  *
  * The streaming twin (same session semantics, incremental state) is
  * `graft.streaming.Streams.sessionizeStream`.
  */
object Sessionize {

  /** @param events frame with `user_id`, `ts` (epoch-ns long), `value`
    * @return one row per (user_id, session_id) with start/end/size
    */
  def apply(events: DataFrame, gapNs: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val newSession = when(
      lag(col("ts"), 1).over(byUser).isNull ||
        col("ts") - lag(col("ts"), 1).over(byUser) > gapNs, 1)
      .otherwise(0)
    events
      .withColumn("new_s", newSession)
      .withColumn("session_id",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("min(ts) div 1000000").as("start_ms"),
        expr("max(ts) div 1000000").as("end_ms"),
        // decimal sum: a double sum is order-dependent across engines
        // (shuffle order differs), which broke oracle parity in r2
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-user event journeys
  * — "after a click, what happens next?": the user-path model behind
  * next-step prediction and journey anomaly detection, completing
  * the product-analytics family (funnel q95, retention q141,
  * attribution q148).
  *
  * Scale shape: ONE user-keyed window (lag in (ms, event_id) total
  * order) and one partial-aggregated census; the probability
  * denominator joins from a states×1 aggregate — never a second
  * pass over events. Output is |states|² rows at any corpus size.
  *
  * Determinism: probabilities are round(n / total, 9) of exact
  * BIGINT counts — cross-engine exact. Each user's first event
  * transitions from the synthetic "(start)" state.
  */
object Transitions {

  /** @param events (user_id, ms, event_id, state)
    * @return (prev_state, next_state, n, p) */
  def matrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val pairs = events
      .withColumn("prev_state", lag(col("state"), 1, "(start)").over(w))
      .groupBy(col("prev_state"), col("state").as("next_state"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("prev_state")
      .agg(sum("n").as("total"))
    pairs.join(broadcast(totals), Seq("prev_state"))
      .select(col("prev_state"), col("next_state"), col("n"),
        round(col("n").cast("double") / col("total"), 9).as("p"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step event funnel (signup → view → click → purchase):
  * how far does each key get through a required sequence of steps,
  * and how fast? The classic product-analytics operator (Amplitude /
  * Mixpanel funnels, MATCH_RECOGNIZE-lite) — reference behavior
  * covered: event-stream analysis over the same `events` table the
  * sessionizer (ops/Sessionize.scala) consumes.
  *
  * Semantics: the funnel ANCHORS at the key's FIRST step-1 event;
  * step i counts only if it occurs at-or-after the running first
  * qualifying step i−1 and within `horizon` of the anchor. This is
  * the "strict-order, single-anchor, conversion-window" variant —
  * deterministic (no per-event re-anchoring), so it is exactly
  * restatable in SQL for the oracle.
  *
  * Scale: ONE hash exchange on the key. The cascading "first
  * qualifying step so far" columns are running-min windows that all
  * share the same (partitionBy key, orderBy ts) sort, so Catalyst
  * plans one Exchange + one Sort and chains the Window operators
  * without re-shuffling; the final per-key reduction is a partial
  * aggregate. State per partition is |steps| running scalars — no
  * buffering, no event-list collection, 100 TB of events stream
  * through.
  */
object Funnel {

  /** Per-key funnel progress.
    *
    * @param events   event rows
    * @param keyCol   funnel entity (e.g. user_id)
    * @param tsCol    event ordering column — must be NUMERIC (epoch
    *                 micros/millis); convert timestamps up front
    *                 (`ts div 1000` etc.). A TimestampType column
    *                 would break both the horizon arithmetic
    *                 (timestamp + long) and report()'s span sum
    *                 (interval vs bigint), so it is rejected eagerly
    * @param steps    ordered (name, row-predicate) funnel steps
    * @param horizon  max tsCol distance from the step-1 anchor for a
    *                 step to count (None = unbounded)
    * @param tiebreak extra ordering columns for same-ts determinism
    * @return (key, stage, first_ts, complete_ts): stage = #steps
    *         reached (0..n), complete_ts set only at full conversion
    */
  def stages(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      steps: Seq[(String, Column)],
      horizon: Option[Long] = None,
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    scala.util.Try(events.schema(tsCol).dataType).toOption.foreach { dt =>
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"tsCol $tsCol must be numeric (epoch micros/millis), got $dt — " +
          "convert timestamps before calling (e.g. `ts div 1000`)")
    }

    // flag columns once (predicates may be arbitrary expressions)
    val flagged = events.select(
      (col(keyCol) +: col(tsCol).as("__ts") +: tiebreak.map(col)) ++
        steps.zipWithIndex.map { case ((_, p), i) => p.as(s"__s$i") }: _*)

    val w = Window.partitionBy(keyCol)
      .orderBy((col("__ts") +: tiebreak.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def inWindow(anchor: Column): Column = horizon match {
      case Some(h) => col("__ts") <= anchor + h
      case None    => lit(true)
    }

    // qual_i = "this row is a qualifying step-i event"; r_i = running
    // first qualifying step-i ts. Each r_i gates qual_{i+1}, so the
    // columns cascade through chained selects over the SAME window.
    def qual(i: Int): Column =
      if (i == 0) when(col("__s0"), col("__ts"))
      else when(col(s"__s$i") && col(s"__r${i - 1}").isNotNull &&
        inWindow(col("__r0")), col("__ts"))

    val cascaded = steps.indices.foldLeft(flagged) { (df, i) =>
      df.withColumn(s"__q$i", qual(i))
        .withColumn(s"__r$i", min(col(s"__q$i")).over(w))
    }

    // the running min over the full partition IS the per-key min of
    // the qualifying-step expression, so the reduction is a plain
    // partial-agg groupBy on the already-shuffled key
    val firsts = cascaded.groupBy(keyCol)
      .agg(min(col("__q0")).as("f0"),
        steps.indices.drop(1).map(i => min(col(s"__q$i")).as(s"f$i")): _*)

    val n = steps.size
    // build innermost-out so the FINAL expression tests the deepest
    // stage first: when(f_{n-1}, n).otherwise(when(f_{n-2}, n-1)...)
    val stage = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"f$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    firsts.select(col(keyCol), stage.as("stage"), col("f0").as("first_ts"),
      when(col(s"f${n - 1}").isNotNull, col(s"f${n - 1}")).as("complete_ts"))
  }

  /** Stage histogram: users per furthest-stage + total conversion
    * span for full conversions.
    */
  def report(stagesDf: DataFrame): DataFrame =
    stagesDf.groupBy("stage")
      .agg(count(lit(1)).as("n_keys"),
        // coalesce: a nullable sum's pandas dtype is value-dependent
        // (int64 without nulls, float64 with), which breaks dtype
        // parity; 0 = "no conversions in this stage bucket"
        coalesce(sum(col("complete_ts") - col("first_ts")), lit(0L))
          .cast("long").as("total_span"))
      .orderBy("stage")
}

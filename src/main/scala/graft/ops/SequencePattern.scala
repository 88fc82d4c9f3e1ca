package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence pattern matching with a negative condition (the
  * MATCH_RECOGNIZE-lite CEP primitive the funnel family cannot
  * express): find every `A then B within W, with NO C strictly
  * between` occurrence per user. q95's funnel counts ordered step
  * progress and q154's transitions count adjacent pairs — neither
  * can say "a view converted to a purchase within the hour and no
  * error interrupted" because the guard is an absence over an
  * interval, not a step.
  *
  * Semantics (deterministic): for each A occurrence, the FIRST B
  * strictly after it within the window (min b_ms; simultaneous Bs
  * collapse to one ms value, and matches key on (user, a_ms) so
  * simultaneous As collapse too); the match survives iff no C lands
  * strictly inside (a_ms, b_ms). Distinct As match independently —
  * two As can claim the same B (each is its own pattern start).
  *
  * Scale shape: three filtered projections of one events scan; the
  * A×B pairing is a USER-keyed equi-join with the window as a join
  * filter (per-user event counts are bounded in any real product
  * stream — the same contract as every window in the funnel family),
  * collapsed by a partial-aggregatable min; the guard is one
  * LEFT ANTI join, also user-keyed. No global sort, no window over
  * the full stream.
  */
object SequencePattern {

  /** @param events (userCol, typeCol, msCol) — ms must be a numeric
    *               epoch-millis column (the events contract, q95).
    * @return (user, a_ms, b_ms, gap_ms) per surviving match.
    */
  def firstThenWithout(
      events: DataFrame,
      userCol: String, typeCol: String, msCol: String,
      a: String, b: String, guard: String,
      windowMs: Long): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    val ev = graft.plans.Plans.barrier(
      events.select(col(userCol).as("user"), col(typeCol).as("typ"),
        col(msCol).cast("long").as("ms")))
    val as = ev.filter(col("typ") === a).select(col("user"), col("ms").as("a_ms"))
    val bs = ev.filter(col("typ") === b).select(col("user"), col("ms").as("b_ms"))
    val cs = ev.filter(col("typ") === guard)
      .select(col("user"), col("ms").as("c_ms"))
    val firstB = as.join(bs, Seq("user"))
      .filter(col("b_ms") > col("a_ms") &&
        col("b_ms") <= col("a_ms") + lit(windowMs))
      .groupBy("user", "a_ms").agg(min(col("b_ms")).as("b_ms"))
    firstB.alias("m")
      .join(cs.alias("c"),
        col("m.user") === col("c.user") &&
          col("c.c_ms") > col("m.a_ms") && col("c.c_ms") < col("m.b_ms"),
        "left_anti")
      .select(col("user"), col("a_ms"), col("b_ms"),
        (col("b_ms") - col("a_ms")).as("gap_ms"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recency-weighted engagement scoring: each event contributes
  * value · 2^(−halvings), where halvings = age-in-days div
  * halfLifeDays relative to the newest event in the slice — the
  * staircase form of exponential half-life decay. Scores like this
  * rank users/documents by "recent activity" without a cutoff cliff.
  *
  * Determinism contract (the reason for the staircase): the exponent
  * is an INTEGER, so the weight 2^(−h) is an exact double AND an
  * exact DECIMAL(20,18) for h ≤ 18; value quantizes to DECIMAL(12,6)
  * exactly like every money column in this repo. The weighted sum is
  * then a decimal sum — order-independent, bit-identical across
  * engines — where a fractional-exponent kernel would make every
  * partial sum order-dependent. Events older than
  * maxHalvings·halfLifeDays have weight < 4e-6 and are dropped by
  * contract (documented horizon, not silent truncation).
  *
  * 100 TB shape: the max-day anchor is a 1-row broadcast; the rest is
  * one scan (age/weight are scan-level projections) and one partial-
  * aggregable groupBy on the key. No windows, no driver state.
  */
object DecayScore {

  def score(
      events: DataFrame,
      keyCol: String,
      dayCol: org.apache.spark.sql.Column,
      valueCol: String,
      halfLifeDays: Int = 2,
      maxHalvings: Int = 18): DataFrame = {
    require(halfLifeDays >= 1, "halfLifeDays must be >= 1")
    require(maxHalvings >= 0 && maxHalvings <= 18,
      "decimal(20,18) weight is exact only for 0..18 halvings")
    val e = events.select(col(keyCol).as("key"), dayCol.as("day"),
      col(valueCol).cast("decimal(12,6)").as("v"))
    val mx = e.agg(max(col("day")).as("mx"))
    e.crossJoin(broadcast(mx))
      .withColumn("halvings",
        floor(datediff(col("mx"), col("day")) / halfLifeDays).cast("int"))
      .filter(col("halvings") <= maxHalvings)
      .withColumn("w", pow(lit(2.0), -col("halvings")).cast("decimal(20,18)"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("raw_sum"),
        sum(col("v") * col("w")).cast("double").as("decayed"))
  }
}

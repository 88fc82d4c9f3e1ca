package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join handling covers joins; for AGGREGATIONS over a
  * skewed key (one user with 10⁹ events, one token in every doc),
  * the standard fix is two-phase salted aggregation: group by
  * (key, salt) first — spreading the hot key over `salt` reducers —
  * then re-aggregate the partials by key. Correct only for
  * decomposable aggregates (sum/count/min/max, and avg via
  * sum+count), which is what this helper exposes.
  *
  * The salt column derives from a hash of the whole row (cheap,
  * deterministic, uniform) — no RNG, so retried tasks produce
  * identical results.
  */
object Skew {

  /** Two-phase salted sum/count/min/max aggregation.
    *
    * @param aggs (outputName, inputColumn, "sum"|"count"|"min"|"max")
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salt: Int,
      aggs: Seq[(String, Column, String)]): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salt)))

    def partial(name: String, c: Column, how: String): Column = how match {
      case "sum" => sum(c).as(name)
      case "count" => count(c).as(name)
      case "min" => min(c).as(name)
      case "max" => max(c).as(name)
      case other => throw new IllegalArgumentException(
        s"non-decomposable aggregate: $other")
    }
    // phase 1: (key, salt) — the hot key fans out over `salt` groups
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial(aggs.head._1, aggs.head._2, aggs.head._3),
        aggs.tail.map(a => partial(a._1, a._2, a._3)): _*)
    // phase 2: merge partials (count partials merge by SUM)
    def merge(name: String, how: String): Column = how match {
      case "sum" | "count" => sum(col(name)).as(name)
      case "min" => min(col(name)).as(name)
      case "max" => max(col(name)).as(name)
    }
    phase1.groupBy(keys.map(col): _*)
      .agg(merge(aggs.head._1, aggs.head._3),
        aggs.tail.map(a => merge(a._1, a._3)): _*)
  }

  /** Salted equi-join for a skewed FACT against a smaller-but-not-
    * broadcastable DIM (the manual twin of AQE's skew-join split,
    * usable when statistics lie or the skew is known up front): the
    * fact side draws a deterministic row-hash salt in [0, r), the
    * dim side replicates ×r via one generator, and the join keys on
    * (key, salt) — the hot key's rows spread over r reducers instead
    * of one straggler task. Inner join; dim must be unique on `key`
    * (replication would double matches otherwise — caller contract,
    * same as any dim join).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      r: Int): DataFrame = {
    require(r >= 1, s"replication must be >= 1, got $r")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(r.toLong)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(r.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt"))
      .drop("__salt")
  }
}

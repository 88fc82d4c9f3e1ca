package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators.
  *
  * Random `df.sample()` is non-reproducible across retries and
  * engines; pipeline sampling wants the same rows every run (so
  * downstream caches, oracles, and A/B slices stay stable). Both
  * operators here are pure pushdown-friendly row predicates — no
  * shuffle, no RNG state, and at 100 TB the filter evaluates inside
  * the scan.
  */
object Sampling {

  /** Systematic 1-in-`every` sample on an integral key. */
  def systematic(df: DataFrame, keyCol: String, every: Long): DataFrame = {
    require(every >= 1, "every must be >= 1")
    df.filter(pmod(col(keyCol), lit(every)) === 0)
  }

  /** Stratified systematic sample: per-stratum `every` denominators
    * with a default for unlisted strata — the dbt/utils-style
    * "sample N% of each segment" reproducibly.
    */
  def stratified(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      every: Map[String, Long],
      defaultEvery: Long): DataFrame = {
    require((defaultEvery +: every.values.toSeq).forall(_ >= 1), "every must be >= 1")
    val denom = every.toSeq.sortBy(_._1).foldLeft(lit(defaultEvery)) {
      case (e, (s, d)) => when(col(strataCol) === s, lit(d)).otherwise(e)
    }
    df.filter(pmod(col(keyCol), denom) === 0)
  }

  /** Hash-fraction sample for keys with non-uniform spacing (string
    * ids, clustered longs): keep rows whose key hash lands in the
    * first `fraction` of the hash space. Deterministic, uniform, and
    * consistent across tables sharing the key — the production path
    * when modulo structure in the key would bias `systematic`.
    * (xxhash64 is engine-specific, so no SQL oracle — covered by the
    * ScalaTest spec instead.)
    */
  def hashFraction(df: DataFrame, keyCols: Seq[String], fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    val buckets = 1000000L
    df.filter(pmod(xxhash64(keyCols.map(col): _*), lit(buckets)) <
      lit((fraction * buckets).toLong))
  }

  /** Column form of the stratified predicate (for reuse in SQL-side
    * mirrors/tests).
    */
  def stratifiedPredicate(
      strataCol: Column, keyCol: Column,
      every: Map[String, Long], defaultEvery: Long): Column = {
    val denom = every.toSeq.sortBy(_._1).foldLeft(lit(defaultEvery)) {
      case (e, (s, d)) => when(strataCol === s, lit(d)).otherwise(e)
    }
    pmod(keyCol, denom) === 0
  }
}

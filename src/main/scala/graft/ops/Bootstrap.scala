package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson bootstrap confidence intervals (Chamandy et al. 2012,
  * "Estimating Uncertainty for Massive Data Streams" — the
  * production one-pass bootstrap): every row joins replicate b with
  * multiplicity ~ Poisson(1), drawn DETERMINISTICALLY from
  * mix30(row, b), so the B resampled totals come out of a single
  * map-side-combined aggregation and are bit-identical across
  * engines and runs. Error bars for warehouse metrics without a
  * second pass — the statistic the profile family (q58/q74) lacks.
  *
  * Scale shape: explode ×B happens INSIDE the scan projection and
  * collapses map-side to |groups|·B cells before the only exchange;
  * the percentile step sorts B values per group — B is a constant
  * (default 100), so the window is metadata-sized at any corpus
  * size.
  *
  * Exactness: weights are integer comparisons of u ∈ (0,1] against
  * HARDCODED Poisson(1) CDF literals (never runtime exp()); the
  * resampled totals are decimal sums of weight·value; percentiles
  * pick exact order statistics rank ⌈p·B⌉ with ties broken on the
  * replicate id.
  */
object Bootstrap {

  /** Poisson(1) CDF at k = 0..8, written once as literals (16 sig
    * digits) so both engines parse the same doubles. P(X > 8) < 1e-6
    * — u above the last threshold caps the weight at 9.
    */
  val PoissonCdf1: Seq[Double] = Seq(
    0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988747974021)

  private val Den = 1073741790.0 // mix30 max + 1: u ∈ (0, 1]

  /** Replicate multiplicity: #{t ∈ CDF : u ≥ t} for
    * u = (mix30(id + b·1000003) + 1) / 2^30ish — 0..9, mean 1.
    * (The additive replicate offset keeps the mix30 pre-multiply
    * operand small: the SQL twin runs on an engine that REJECTS
    * BIGINT overflow, so the combined key must stay ≲ 3·10⁹ at
    * oracle scale — ids at the correctness SF are ~10⁶.)
    */
  /** The uniform draw — compute this ONCE in a projection and feed
    * `weightFromU`: referencing `weight(id, b)` directly inside an
    * aggregate inlines the mix chain into all 9 CDF branches
    * (aggregate expressions get no common-subexpression
    * elimination — measured 7× slower at sf0.1).
    */
  def u(id: Column, b: Column): Column =
    (Sampling.mix30(id + b * lit(1000003L)) + lit(1L))
      .cast("double") / lit(Den)

  /** #{t ∈ CDF : u ≥ t} over an already-materialized draw. */
  def weightFromU(u: Column): Column =
    PoissonCdf1.map(t => when(u >= lit(t), 1).otherwise(0))
      .reduce(_ + _)

  def weight(id: Column, b: Column): Column = weightFromU(u(id, b))

  /** SQL text of the same weight, for oracle authorship. */
  def weightSql(id: String, b: String): String = {
    val u = s"((${Sampling.mix30Sql(s"($id + $b * 1000003)")}) + 1) / $Den"
    PoissonCdf1.map(t => s"CASE WHEN ($u) >= $t THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
  }

  /** Bootstrap CI of the per-group decimal sum of `valueCol`:
    * one row per (group, p) with the exact order-statistic of the B
    * resampled totals at rank ⌈p·B⌉.
    *
    * @param df      rows carrying `idCol` (unique), `groupCol`,
    *                `valueCol`
    * @param b       replicate count (the window below sorts B rows
    *                per group — keep it a constant, default 100)
    */
  def sumCi(df: DataFrame, groupCol: String, idCol: String, valueCol: String,
      b: Int = 100, ps: Seq[Double] = Seq(0.05, 0.5, 0.95)): DataFrame = {
    require(b >= 1, s"b must be >= 1, got $b")
    require(ps.map(p => math.max(1L, math.ceil(p * b).toLong)).distinct.size
      == ps.size, s"percentiles $ps collide at B=$b — raise b")
    // value quantized ONCE per row to long micros (Sessionize's
    // trick): the ×B hot loop then runs pure BIGINT multiply-add in
    // codegen instead of per-row BigDecimal churn (27s → ~2s at
    // sf0.1), and micros/1e6 is bit-identical to the decimal sum.
    // Headroom: Σ|v|·10⁶·9 per (group, replicate) must stay under
    // 2^63 — 10¹² rows of |v| ≤ 10⁶ per group; beyond that, shard
    // the group key before calling.
    // the ×B explode multiplies work AFTER the scan, so input split
    // sizing under-provisions it (a 600k-row table is 2 parquet
    // splits → 2 tasks doing 60M-row aggregation); spread the
    // pre-explode rows across the cluster first — a rows-sized
    // round-robin exchange, 1/B of the generated volume
    val par = df.sparkSession.sparkContext.defaultParallelism
    val totals = df
      .select(col(groupCol).as("g"), col(idCol).as("id"),
        col(valueCol).cast("decimal(18,6)").as("v"))
      .repartition(par)
      .select(col("g"), col("id"), (col("v") * lit(1000000))
          .cast("long").as("vq"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .withColumn("u", u(col("id"), col("rep"))) // once per (row, rep)
      .groupBy("g", "rep")
      .agg(sum(col("vq") * weightFromU(col("u"))).as("tq"))
    // rank on the EXACT integer total; surface a rounded double
    val w = Window.partitionBy("g").orderBy("tq", "rep")
    val ranks = ps.map(p => math.max(1L, math.ceil(p * b).toLong))
    val rankToP = ranks.zip(ps).toMap
    totals.withColumn("rn", row_number().over(w))
      .filter(col("rn").isin(ranks: _*))
      .select(col("g").as(groupCol),
        ranks.foldLeft(lit(null).cast("double")) { (acc, r) =>
          when(col("rn") === r, lit(rankToP(r))).otherwise(acc)
        }.as("p"),
        round(col("tq").cast("double") / lit(1000000.0), 6).as("total"))
  }
}

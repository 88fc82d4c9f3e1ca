package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Differentially-private histogram release via the Laplace
  * mechanism (Dwork 2006) with SEEDED noise — completes the privacy
  * family (q166 k-anonymity / q241 t-closeness audit the input;
  * this releases the output): each published cell gets
  * Laplace(b = sensitivity/ε) noise derived DETERMINISTICALLY from
  * its cell key PLUS a caller-supplied secret salt through the
  * engine-portable mix30 hash, so a rerun (or a second engine,
  * given the same salt) releases the SAME noisy table — the
  * reproducible-pipeline requirement that true RNG breaks.
  *
  * SECURITY CONTRACT: the DP guarantee holds only if the salt is
  * drawn from a real entropy source and kept as secret as the data —
  * anyone holding the salt (or a release made with the default
  * salt=0) can recompute noise_mu from the published cell keys and
  * subtract it. salt=0 therefore yields a REPRODUCIBLE-NOISE release
  * (useful for cross-engine parity testing, as q287 does), not a
  * differentially-private one.
  *
  * Inverse-CDF sampling, all knife-edges floored portably:
  *   u    = (mix30(key)+1) / 1073741790          ∈ (0, 1]
  *   mag6 = floor(round(−ln u, 6)·1e6 + 0.5)     exact µ-BIGINT
  *   noise_mu = ±b·mag6  (sign = parity of mix30(key·31+7))
  * The ln is the ONE transcendental, immediately 6dp-rounded (the
  * q234 discipline); everything after is integer.
  *
  * Scale shape: noise is a per-GROUP projection after the exact
  * count aggregate — zero extra passes, zero state; cells stream.
  */
object DpNoise {

  private val Den = 1073741790d // mix30 max + 2: u ∈ (0, 1]

  /** µ-scaled seeded Laplace noise for integer-keyed cells. `b` is
    * the scale (sensitivity/ε) as a positive integer; `salt` is the
    * secret seed (see the security contract above — salt=0 is a
    * parity-testing mode, not a DP release). */
  private val P30 = 1073741789L // mix30's modulus: largest prime < 2^30

  def laplaceMu(key: Column, b: Int, salt: Long = 0L): Column = {
    require(b >= 1 && salt >= 0, s"b >= 1, salt >= 0: $b, $salt")
    // fold key and salt into mix30's < 2^30 input domain SEPARATELY
    // before adding (pmod(key)+saltMod < 2^31), so the fold is
    // overflow-total: even salt = Long.MaxValue with a large key
    // cannot overflow ANSI long arithmetic — a raw `key + salt`
    // would be evaluated before any pmod and could. salt=0 keeps
    // saltMod=0, preserving the historical q287 draw exactly
    val saltMod = salt % P30
    val k = pmod(pmod(key, lit(P30)) + lit(saltMod), lit(P30))
    val mag6 = floor(round(-log((Sampling.mix30(k) + 1) / lit(Den)), 6)
      * 1000000d + 0.5d).cast("long")
    val sign = when(
      pmod(Sampling.mix30(pmod(k * 31 + 7, lit(P30))), lit(2)) === 0,
      1L).otherwise(-1L)
    sign * mag6 * b
  }

  /** SQL text of the same draw, for oracle authorship. `key` must be
    * non-negative (DuckDB `%` and Spark `pmod` then agree). */
  def laplaceMuSql(key: String, b: Int, salt: Long = 0L): String = {
    val k = s"((($key % $P30) + ${salt % P30}) % $P30)"
    val u = s"((${Sampling.mix30Sql(k)}) + 1) / $Den"
    val mag6 = s"CAST(floor(round(-ln($u), 6) * 1000000 + 0.5) AS BIGINT)"
    val sign = s"CASE WHEN (${Sampling.mix30Sql(s"(($k * 31 + 7) % $P30)")}) % 2 = 0" +
      " THEN 1 ELSE -1 END"
    s"($sign) * $mag6 * $b"
  }

  /** DP count release: exact per-cell counts + their seeded noise
    * and the µ-scaled noisy count. `keyCol` must be an integral cell
    * key (caller encodes composite cells). A real release publishes
    * ONLY n_noisy_mu; n_true/noise_mu are returned for auditability
    * and must be dropped at the trust boundary. */
  def countRelease(
      df: DataFrame,
      cellCols: Seq[String],
      keyCol: String,
      b: Int,
      salt: Long = 0L): DataFrame =
    df.groupBy((keyCol +: cellCols).map(col): _*)
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noise_mu", laplaceMu(col(keyCol), b, salt))
      .withColumn("n_noisy_mu", col("n_true") * 1000000L + col("noise_mu"))
}

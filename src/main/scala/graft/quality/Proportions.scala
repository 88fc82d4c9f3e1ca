package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wilson score interval for proportions (Wilson 1927) — the
  * binomial CI every rate dashboard should use instead of the
  * textbook Wald interval, which collapses to zero width at p̂ ∈
  * {0, 1} and undercovers badly at small n (Brown, Cai & DasGupta
  * 2001): conversion rates, defect rates, success shares per
  * segment all need "how sure are we?" next to the point estimate.
  *
  *   center = (p̂ + z²/2n) / (1 + z²/n)
  *   half   = z/(1 + z²/n) · √(p̂(1−p̂)/n + z²/4n²)
  *
  * Exactness: n and k are exact integers from one partial-
  * aggregatable groupBy; the interval is a FIXED double chain on
  * (k, n, z) written in one association both engines evaluate
  * identically, rounded to 9dp. No erf, no iteration — the Wilson
  * form is algebraic, which is exactly why it is the
  * cross-engine-safe choice here.
  *
  * Scale shape: one groupBy, output ∝ segments. Nothing else moves.
  */
object Proportions {

  /** @param df rows with `g` (segment) and `hit` (0/1).
    * @return (g, n, k, rate, ci_lo, ci_hi) at the given z
    *   (1.96 ≈ 95%).
    */
  def wilson(df: DataFrame, z: Double = 1.96): DataFrame = {
    val agg = df.groupBy("g").agg(count(lit(1)).as("n"),
      sum(col("hit").cast("long")).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val half = (lit(z) / denom) *
      sqrt(p * (lit(1.0) - p) / nD + z2 / (lit(4.0) * nD * nD))
    agg.select(col("g"), col("n"), col("k"),
      round(p, 9).as("rate"),
      round(greatest(center - half, lit(0.0)), 9).as("ci_lo"),
      round(least(center + half, lit(1.0)), 9).as("ci_hi"))
  }

  /** The same interval as SQL text over columns `n`/`k` (for oracle
    * authorship) — identical association, identical rounding.
    */
  def wilsonSql(z: Double = 1.96): (String, String, String) = {
    val z2 = z * z
    val p = "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    val nD = "CAST(n AS DOUBLE)"
    val denom = s"(1.0 + $z2 / $nD)"
    val center = s"(($p + $z2 / (2.0 * $nD)) / $denom)"
    val half = s"(($z / $denom) * sqrt($p * (1.0 - $p) / $nD" +
      s" + $z2 / (4.0 * $nD * $nD)))"
    (s"round($p, 9)",
      s"round(greatest($center - $half, 0.0), 9)",
      s"round(least($center + $half, 1.0), 9)")
  }
}

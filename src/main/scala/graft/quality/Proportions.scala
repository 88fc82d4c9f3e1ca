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

  /** Pooled two-proportion z-test — the conversion-rate A/B readout
    * (the binary-outcome sibling of q189's Welch t and q315's ratio
    * delta method):
    *
    *   z = (p̂_b − p̂_a) / √( p̂(1−p̂)·(1/n_a + 1/n_b) )
    *
    * Exactness: counts exact; z is one fixed double chain rounded
    * 6 dp; degenerate pools (p̂ ∈ {0,1}) or empty arms report null
    * (stated).
    *
    * Input: per (g) rows with `isb` (0/1 arm) and `hit` (0/1).
    */
  def twoProportionZ(
      df: DataFrame,
      stratumCol: String,
      isB: org.apache.spark.sql.Column,
      hitCol: String,
      zCrit: Double = 1.959963985): DataFrame = {
    val h = col(hitCol).cast("long")
    val cells = df.groupBy(col(stratumCol).as("g"))
      .agg(sum(when(isB, 0L).otherwise(1L)).as("n_a"),
        sum(when(isB, 1L).otherwise(0L)).as("n_b"),
        sum(when(isB, 0L).otherwise(h)).as("k_a"),
        sum(when(isB, h).otherwise(0L)).as("k_b"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val pa = d(col("k_a")) / d(col("n_a"))
    val pb = d(col("k_b")) / d(col("n_b"))
    val pp = d(col("k_a") + col("k_b")) / d(col("n_a") + col("n_b"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b"))))
    val ok = col("n_a") > 0 && col("n_b") > 0 &&
      col("k_a") + col("k_b") > 0 &&
      col("k_a") + col("k_b") < col("n_a") + col("n_b")
    cells.select(col("g").as(stratumCol),
      col("n_a"), col("n_b"),
      round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
      when(ok, round((pb - pa) / se, 6)).as("z"),
      when(ok, abs((pb - pa) / se) > zCrit).as("significant"))
  }

  /** DuckDB restatement over `pz_rel(g, isb, hit)`; ends in
    * `pz_out(g, n_a, n_b, rate_a, rate_b, z, significant)`. */
  def twoProportionZSql(zCrit: Double = 1.959963985): String = {
    val pa = "(CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
    val pb = "(CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    val pp = "(CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
    val se = s"sqrt($pp * (1.0 - $pp)" +
      s" * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))"
    val ok = "n_a > 0 AND n_b > 0 AND k_a + k_b > 0" +
      " AND k_a + k_b < n_a + n_b"
    s"""pz_cells AS (
       |  SELECT g, CAST(sum(1 - isb) AS BIGINT) AS n_a,
       |    CAST(sum(isb) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN isb = 0 THEN hit ELSE 0 END) AS BIGINT)
       |      AS k_a,
       |    CAST(sum(CASE WHEN isb = 1 THEN hit ELSE 0 END) AS BIGINT)
       |      AS k_b
       |  FROM pz_rel GROUP BY g
       |), pz_out AS (
       |  SELECT g, n_a, n_b,
       |    round($pa, 6) AS rate_a, round($pb, 6) AS rate_b,
       |    CASE WHEN $ok THEN round(($pb - $pa) / $se, 6) END AS z,
       |    CASE WHEN $ok THEN abs(($pb - $pa) / $se) > $zCrit END
       |      AS significant
       |  FROM pz_cells
       |)""".stripMargin
  }
}

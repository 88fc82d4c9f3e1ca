package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohen's kappa between two binary raters (Cohen 1960) — the
  * eval-ops primitive for comparing two filter heuristics (or a
  * cheap heuristic against an expensive model) before swapping one
  * in: RAW agreement flatters any pair of raters that both say
  * "keep" most of the time; kappa subtracts the agreement chance
  * would produce from the marginals,
  *   κ = (p_o − p_e) / (1 − p_e).
  *
  * Scale shape: the 2×2 contingency table per group is four
  * conditional sums in ONE partial-aggregated pass; the formula then
  * runs on exact integers (counts) promoted to double in one
  * identical chain (marginal products computed in double — at corpus
  * scale N² outgrows BIGINT). κ is null for a degenerate group where
  * chance agreement is 1 (both raters constant).
  */
object Agreement {

  /** @param a,b boolean rater verdict columns.
    * @return per group: the contingency counts, observed agreement,
    *         and kappa (6dp).
    */
  def kappa(df: DataFrame, a: Column, b: Column,
      groupCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("group_key"),
      a.as("ra"), b.as("rb"))
      .groupBy("group_key")
      .agg(count(lit(1)).as("n"),
        count(when(col("ra") && col("rb"), 1)).as("n11"),
        count(when(col("ra") && !col("rb"), 1)).as("n10"),
        count(when(!col("ra") && col("rb"), 1)).as("n01"),
        count(when(!col("ra") && !col("rb"), 1)).as("n00"))
    val nd = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nd
    val pe = ((col("n11") + col("n10")).cast("double") *
        (col("n11") + col("n01")).cast("double") +
      (col("n01") + col("n00")).cast("double") *
        (col("n10") + col("n00")).cast("double")) / (nd * nd)
    g.select(col("group_key"), col("n"),
      col("n11"), col("n10"), col("n01"), col("n00"),
      round(po, 6).as("p_observed"),
      when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Fleiss' kappa for m ≥ 2 BINARY raters (Fleiss 1971) — the
    * multi-rater generalization of [[kappa]]: how much do m keep/drop
    * heuristics agree beyond chance across a whole rater PANEL (the
    * question a quality-gate ensemble asks before majority-voting).
    *
    * With aᵢ = #raters voting true on subject i:
    *   P_i = (aᵢ² + (m−aᵢ)² − m) / (m(m−1))
    *   P̄_o = Σᵢ P_i / n ;  p₁ = Σaᵢ/(nm) ;  P_e = p₁² + (1−p₁)²
    *   κ   = (P̄_o − P_e) / (1 − P_e)
    *
    * Exactness: Σaᵢ and Σ(aᵢ² + (m−aᵢ)²) are BIGINT sums; κ is one
    * fixed double chain rounded 6 dp. Unanimous-everywhere panels
    * (P_e = 1) report null (κ undefined, stated).
    *
    * Scale shape: one conditional-sum groupBy pass — no per-rater
    * joins, no pivots; m is a literal.
    */
  def fleiss(
      df: DataFrame,
      raters: Seq[Column],
      groupCol: String): DataFrame = {
    val m = raters.size
    require(m >= 2, s"need >= 2 raters: $m")
    val a = raters.map(r => when(r, 1L).otherwise(0L))
      .reduce(_ + _)
    val g = df.select(col(groupCol).as("group_key"), a.as("a"))
      .groupBy("group_key")
      .agg(count(lit(1)).as("n"),
        sum(col("a")).as("t"),
        sum(col("a") * col("a") +
          (lit(m.toLong) - col("a")) * (lit(m.toLong) - col("a")))
          .as("s2"))
    val nd = col("n").cast("double")
    val po = (col("s2") - col("n") * m).cast("double") /
      (nd * m * (m - 1))
    val p1 = col("t").cast("double") / (nd * m)
    val pe = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
    g.select(col("group_key"), col("n"), lit(m.toLong).as("m"),
      round(po, 6).as("p_observed"),
      round(pe, 6).as("p_expected"),
      when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** DuckDB restatement of [[fleiss]] over
    * `subjects(group_key, a)` (a = #true votes, 0..m); ends in
    * `fleiss_out(group_key, n, m, p_observed, p_expected, kappa)`. */
  def fleissSql(m: Int): String =
    s"""fleiss_g AS (
       |  SELECT group_key, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(a) AS BIGINT) AS t,
       |    CAST(sum(a * a + ($m - a) * ($m - a)) AS BIGINT) AS s2
       |  FROM subjects GROUP BY group_key
       |), fleiss_out AS (
       |  SELECT group_key, n, CAST($m AS BIGINT) AS m,
       |    round(CAST(s2 - n * $m AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * $m * ${m - 1}), 6) AS p_observed,
       |    round((CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |        * (CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |      + (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |        * (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m)),
       |      6) AS p_expected,
       |    CASE WHEN (CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |        * (CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |      + (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |        * (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |        < 1.0 THEN
       |      round(((CAST(s2 - n * $m AS DOUBLE)
       |          / (CAST(n AS DOUBLE) * $m * ${m - 1}))
       |        - ((CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |          * (CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |        + (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |          * (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))))
       |      / (1.0 - ((CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |          * (CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |        + (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m))
       |          * (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * $m)))),
       |      6)
       |    END AS kappa
       |  FROM fleiss_g
       |)""".stripMargin
}

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
}

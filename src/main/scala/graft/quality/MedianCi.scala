package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-free median confidence interval from ORDER
  * STATISTICS (the binomial/sign-test interval, normal-approximated
  * ranks — Hahn & Meeker): the honest uncertainty for a median KPI;
  * q155's bootstrap covers means, but a median CI needs no
  * resampling at all — ranks ⌊n/2 ± z√n/2⌋ bound it exactly.
  *
  * Exactness: ranks come from the q225-family exact cumulative
  * counts (two-level bucketed prefix — no global sort); the three
  * rank indices are floor/ceil chains of one √n each (portable);
  * value picks are conditional MINs over the cumulative table; the
  * interpolated median is one fixed (a+b)/2 chain rounded 6 dp.
  *
  * Scale shape: rows collapse to distinct values per stratum first;
  * everything after is stratum-width.
  */
object MedianCi {

  private val Z = 1.959963985 // two-sided 95%

  /** Per-stratum median + 95% order-statistic CI of `valueCol`.
    * Returns (stratum, n, median, ci_lo, ci_hi). */
  def interval(df: DataFrame, stratumCol: String, valueCol: String)
      : DataFrame = {
    val cum = RankTests.cumulativeCounts(df, stratumCol, lit(false),
      valueCol)
    val counts = cum.groupBy("g").agg(sum("ca").as("n"))
    val joined = cum.join(counts, Seq("g"))
    def rankOf(r: Column): Column = min(when(col("cuma") >= r, col("v")))
    val n = col("n")
    val nd = n.cast("double")
    val rMedLo = expr("(n + 1) div 2")
    val rMedHi = expr("n div 2 + 1")
    val rLo = greatest(lit(1L),
      floor(nd / 2 - lit(Z) * sqrt(nd) / 2).cast("long"))
    val rHi = least(n,
      ceil(nd / 2 + 1 + lit(Z) * sqrt(nd) / 2).cast("long"))
    joined.groupBy("g", "n")
      .agg(rankOf(rMedLo).as("v_lo"), rankOf(rMedHi).as("v_hi"),
        rankOf(rLo).as("ci_lo"), rankOf(rHi).as("ci_hi"))
      .select(col("g").as(stratumCol), col("n"),
        round((col("v_lo") + col("v_hi")) / 2, 6).as("median"),
        col("ci_lo"), col("ci_hi"))
  }

  /** DuckDB restatement: expects the q225-family cum CTE in scope —
    * `cum(g, v, ca, cuma, …)` — and emits
    * `mci_out(g, n, median, ci_lo, ci_hi)`. */
  def intervalSql(cumRel: String): String =
    s"""mci_n AS (
       |  SELECT g, CAST(sum(ca) AS BIGINT) AS n FROM $cumRel GROUP BY g
       |), mci_out AS (
       |  SELECT c.g, any_value(m.n) AS n,
       |    round((min(CASE WHEN c.cuma >= (m.n + 1) // 2 THEN c.v END)
       |      + min(CASE WHEN c.cuma >= m.n // 2 + 1 THEN c.v END))
       |      / 2, 6) AS median,
       |    min(CASE WHEN c.cuma >= greatest(1,
       |      CAST(floor(CAST(m.n AS DOUBLE) / 2
       |        - $Z * sqrt(CAST(m.n AS DOUBLE)) / 2) AS BIGINT))
       |      THEN c.v END) AS ci_lo,
       |    min(CASE WHEN c.cuma >= least(m.n,
       |      CAST(ceil(CAST(m.n AS DOUBLE) / 2 + 1
       |        + $Z * sqrt(CAST(m.n AS DOUBLE)) / 2) AS BIGINT))
       |      THEN c.v END) AS ci_hi
       |  FROM $cumRel c JOIN mci_n m USING (g)
       |  GROUP BY c.g
       |)""".stripMargin
}

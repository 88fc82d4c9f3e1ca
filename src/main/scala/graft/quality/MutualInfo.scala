package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mutual information and Theil's uncertainty coefficient between
  * two columns — the SOFT functional dependency (q172 answers "does
  * A determine B exactly"; this answers "how MUCH does knowing A
  * tell you about B", the feature-selection / redundancy-detection
  * score):
  *   MI(A;B) = Σ p(ab)·ln(p(ab)/(p(a)p(b)))
  *   U(B|A)  = MI / H(B)   ∈ [0,1], 1 ⟺ A determines B exactly.
  *
  * Scale shape: ONE corpus pass builds the (a, b) contingency cells
  * (partial-aggregatable counts); marginals come from KEYED windows
  * over the cells table (never the corpus); N is one driver scalar
  * (BM25's precedent). The entropy sums follow q93's rounding
  * discipline: each cell's term rounds at 12dp and sums as
  * DECIMAL(38,12) — order-independent, so the one-reducer final
  * combine is exact — and ln's cross-engine 1-ulp wobble (~1e-17)
  * is invisible at 12dp.
  *
  * NULL contract: rows with NULL on either side are excluded before
  * counting (matching q172's COUNT DISTINCT semantics).
  */
object MutualInfo {

  private def termSum(t: Column): Column =
    sum(round(t, 12).cast("decimal(38,12)")).cast("double")

  /** @return one row: (lhs, rhs, n, mi, h_lhs, h_rhs, u) with
    *         u = MI/H(rhs) (null when H(rhs) = 0 — a constant rhs
    *         has nothing to explain).
    */
  def score(df: DataFrame, a: String, b: String): DataFrame = {
    val cells = graft.plans.Plans.barrier(
      df.filter(col(a).isNotNull && col(b).isNotNull)
        .groupBy(col(a).as("av"), col(b).as("bv"))
        .agg(count(lit(1)).as("n_ab")))
    val nRow = cells.agg(sum(col("n_ab"))).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(n > 0, s"mutualInfo($a, $b): no non-null rows")
    val nd = lit(n.toDouble)
    val withMargins = cells
      .withColumn("n_a", sum(col("n_ab")).over(Window.partitionBy("av")))
      .withColumn("n_b", sum(col("n_ab")).over(Window.partitionBy("bv")))
    val pAb = col("n_ab").cast("double") / nd
    val miT = pAb * log((col("n_ab").cast("double") * nd) /
      (col("n_a").cast("double") * col("n_b").cast("double")))
    // marginal entropies: weight each CELL by its share of the
    // marginal so the same single pass serves all three sums
    val haT = (col("n_ab").cast("double") / col("n_a")) *
      (col("n_a").cast("double") / nd) * -log(col("n_a").cast("double") / nd)
    val hbT = (col("n_ab").cast("double") / col("n_b")) *
      (col("n_b").cast("double") / nd) * -log(col("n_b").cast("double") / nd)
    withMargins
      .agg(termSum(miT).as("mi_raw"), termSum(haT).as("ha_raw"),
        termSum(hbT).as("hb_raw"))
      .select(lit(a).as("lhs"), lit(b).as("rhs"), lit(n).as("n"),
        round(col("mi_raw"), 9).as("mi"),
        round(col("ha_raw"), 9).as("h_lhs"),
        round(col("hb_raw"), 9).as("h_rhs"),
        when(round(col("hb_raw"), 9) > 0,
          round(round(col("mi_raw"), 9) / round(col("hb_raw"), 9), 9))
          .as("u"))
  }
}

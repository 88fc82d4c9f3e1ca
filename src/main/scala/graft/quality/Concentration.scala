package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Revenue/usage concentration per group — the Lorenz/Gini
  * inequality readout ("do 5 customers carry this market?") that
  * sits beside q178's join-skew and q204's partition-skew as the
  * BUSINESS-side skew lens. Gini from the rank identity
  *   G = 2·Σ rᵢxᵢ / (n·Σx) − (n+1)/n
  * with ranks in (x, id) order — ties broken by id so the sum is
  * deterministic (the identity is tie-order-invariant in exact
  * arithmetic anyway; the pin makes both engines walk the same
  * rows).
  *
  * Exactness: x is integer units (quantize money to cents first), so
  * Σx and Σrx are exact BIGINTs from one keyed window + one
  * partial-aggregated rollup; the closing formula is a fixed double
  * chain. ZERO-weight members must be INCLUDED by the caller (a
  * customer with no orders is the inequality, not noise — the query
  * uses a left join for exactly that). Degenerate groups (Σx = 0)
  * report null.
  *
  * Scale: the rank window is GROUP-keyed (the q102/q103 per-group
  * reducer contract); no global sort.
  */
object Concentration {

  /** @param df (g, id, x) — group, tie-break id, non-negative
    *   integer weight.
    * @return (g, n_members, total, gini).
    */
  def gini(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("x"), col("id"))
    val ranked = df.withColumn("r", row_number().over(w))
    val nD = col("n").cast("double")
    ranked.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("total"),
        sum(col("r") * col("x")).as("srx"))
      .select(col("g"), col("n").as("n_members"), col("total"),
        when(col("total") > 0,
          round(lit(2.0) * col("srx") / (nD * col("total").cast("double"))
            - (nD + 1.0) / nD, 6)).as("gini"))
  }
}

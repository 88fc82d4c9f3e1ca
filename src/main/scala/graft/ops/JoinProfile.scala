package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-join profile — the planning advisor that answers, BEFORE a
  * 100 TB shuffle, "how big is this join and do the keys even
  * line up" (q178 answers the third question, "is it skewed"):
  * for a candidate equi-join edge,
  *  - exact output cardinality  |A ⋈ B| = Σ_k n_a(k)·n_b(k)
  *    (a fan-out ≫ max(|A|,|B|) means a hidden many-to-many),
  *  - key containment both ways (matched-key share of each side's
  *    distinct keys — low containment means the join mostly drops
  *    or orphans rows; q159's FK orphans are 1 − containment),
  *  - matched-row shares (what fraction of each side's ROWS survive
  *    an inner join).
  *
  * Scale shape: each side collapses to its key census first
  * (partial-aggregatable 8-byte keys — the CENSUSES join, not the
  * tables), then one census-join aggregate; per-side totals are
  * bounded driver scalars (BM25's precedent). NULL keys are
  * excluded (SQL equi-joins never match them) and reported.
  */
object JoinProfile {

  /** @return one row: distinct/row/null counts per side, matched key
    *         count, exact join cardinality, and four share ratios.
    */
  def profile(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    def census(df: DataFrame, key: String) =
      graft.plans.Plans.barrier(df.select(col(key).as("k"))
        .filter(col("k").isNotNull)
        .groupBy("k").agg(count(lit(1)).as("n")))
    def scalars(df: DataFrame, key: String): (Long, Long) = {
      val r = df.agg(count(lit(1)), count(col(key))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (lRows, lNonNull) = scalars(left, leftKey)
    val (rRows, rNonNull) = scalars(right, rightKey)
    require(lNonNull > 0 && rNonNull > 0,
      "profile: a side has no non-null keys")
    val lC = census(left, leftKey)
    val rC = census(right, rightKey)
    val lDistinct = lC.count()
    val rDistinct = rC.count()
    lC.select(col("k"), col("n").as("n_l"))
      .join(rC.select(col("k"), col("n").as("n_r")), Seq("k"))
      .agg(count(lit(1)).as("matched_keys"),
        coalesce(sum(col("n_l")), lit(0L)).as("lm"),
        coalesce(sum(col("n_r")), lit(0L)).as("rm"),
        coalesce(sum(col("n_l") * col("n_r")), lit(0L)).as("join_rows"))
      .select(lit(lRows).as("l_rows"), lit(lDistinct).as("l_distinct"),
        lit(lRows - lNonNull).as("l_null_rows"),
        lit(rRows).as("r_rows"), lit(rDistinct).as("r_distinct"),
        lit(rRows - rNonNull).as("r_null_rows"),
        col("matched_keys"), col("join_rows"),
        round(col("matched_keys").cast("double") / lit(lDistinct.toDouble), 9)
          .as("l_key_containment"),
        round(col("matched_keys").cast("double") / lit(rDistinct.toDouble), 9)
          .as("r_key_containment"),
        round(col("lm").cast("double") / lit(lRows.toDouble), 9)
          .as("l_row_match_share"),
        round(col("rm").cast("double") / lit(rRows.toDouble), 9)
          .as("r_row_match_share"))
  }
}

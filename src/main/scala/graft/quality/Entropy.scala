package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column Shannon entropy + cardinality profile — the
  * "what IS this column" classifier that warehouse catalogs run on
  * ingest (id? enum? free text?), sitting beside [[Profile]]'s
  * numeric moments and [[FunctionalDeps]]' dependency discovery.
  * Entropy in nats from the value census:
  *
  *   H = ln(n) − (Σ c·ln c) / n
  *
  * Determinism: counts are exact; each ln term is the two-op chain
  * round(ln(c)·c, 6) — µ-quantized BEFORE the decimal-exact total
  * (the [[Drift.chiSquare]] discipline), so a last-ulp libm
  * disagreement can't accumulate; the closing H is a fixed double
  * chain rounded to 9. Nulls are excluded from the census and
  * reported separately (null is absence, not a value).
  *
  * Classification on exact integers only: constant (≤ 1 distinct),
  * id_like (distinct ≥ 95% of rows), categorical (≤ 64 distinct),
  * else text_like.
  *
  * 100 TB shape: one melt projection + two partial-aggregable
  * groupBys ((column, value) census, then per-column rollup) —
  * keyed shuffles on (column, value), output ∝ columns. A
  * pathological column where every value is distinct makes the
  * census data-sized but still keyed — swap in a sketch when only
  * the classification is needed.
  */
object Entropy {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val melted = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("cn"), col(c).cast("string").as("v"))): _*))
      .as("p")).select(col("p.cn").as("cn"), col("p.v").as("v"))
    val census = melted.filter(col("v").isNotNull)
      .groupBy("cn", "v").agg(count(lit(1)).as("c"))
    val nulls = melted.groupBy("cn")
      .agg(count(when(col("v").isNull, 1)).as("n_nulls"))
    val term = round(log(col("c").cast("double")) * col("c"), 6)
      .cast("decimal(28,6)")
    val per = census.groupBy("cn").agg(
      sum(col("c")).as("n"),
      count(lit(1)).as("n_distinct"),
      sum(term).as("sl"),
      max(col("c")).as("mx"))
    val nD = col("n").cast("double")
    // left join FROM the null census: an all-null column must still
    // report (with zero counts and null entropy), not vanish
    nulls.join(per, Seq("cn"), "left")
      .select(col("cn").as("column"),
        coalesce(col("n"), lit(0L)).as("n"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        // clamp at 0: the µ-quantized terms can land a degenerate
        // (single-value) column a few nano-nats negative
        when(col("n") > 0, greatest(
          round(log(nD) - col("sl").cast("double") / nD, 9), lit(0.0)))
          .as("entropy_nats"),
        when(col("n") > 0,
          round(col("mx").cast("double") / nD, 9)).as("top_share"),
        when(coalesce(col("n_distinct"), lit(0L)) <= 1, "constant")
          .when(col("n_distinct") * 100 >= col("n") * 95, "id_like")
          .when(col("n_distinct") <= 64, "categorical")
          .otherwise("text_like").as("class"))
  }
}

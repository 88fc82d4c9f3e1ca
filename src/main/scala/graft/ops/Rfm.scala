package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.quality.RankTransform

/** RFM (recency / frequency / monetary) customer segmentation — the
  * classic marketing-analytics rollup: score every customer 1–5 on
  * each axis by POPULATION QUINTILE, then name the standard
  * segments (champion / loyal / new / at-risk / hibernating). Next
  * to [[graft.ops.Retention]]'s cohort grids and [[DecayScore]]'s
  * recency weighting, this is the stateless batch readout CRMs
  * export nightly.
  *
  * Quintiles come from the [[RankTransform]] mid-rank CDF — the
  * two-level bucketed prefix, NO global ntile window (a global
  * `ntile(5) OVER (ORDER BY metric)` is a single-reducer sort at
  * 100 TB; the CDF mapping table is distinct-values-sized and the
  * scores join back keyed). score = floor(cdf·5)+1 clamped to 5;
  * recency INVERTS (6 − q) so 5 always means "best". Mid-rank CDF
  * also gives the tie contract for free: equal metric values share
  * one mid-position, so ties land in the same quintile in any
  * engine — no row_number coin flips.
  *
  * Exactness: metrics are exact integers (days, counts, cents);
  * cdf is one double division of exact integers — bit-identical
  * cross-engine — and the ·5 floor is the same double op both
  * sides.
  *
  * 100 TB shape: one partial-aggregatable groupBy(customer), three
  * distinct-value CDF mapping tables, three keyed joins back.
  * Output ∝ customers.
  */
object Rfm {

  /** @param orders (cust, order_ms, cents): customer key, order
    *   epoch-millis, order value in cents.
    * @return (cust, recency_days, frequency, monetary_cents, r, f,
    *   m, segment)
    */
  def segment(orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("cust"))
      .agg(max(col("order_ms")).as("last_ms"),
        count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
    val anchor = perCust.agg(max(col("last_ms")).as("now_ms"))
    val metrics = perCust.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        ((col("now_ms") - col("last_ms")) - pmod(col("now_ms") -
          col("last_ms"), lit(86400000L))) / lit(86400000L))
      .withColumn("recency_days", col("recency_days").cast("long"))
      .drop("last_ms", "now_ms")

    def quintile(cdf: org.apache.spark.sql.Column) =
      least(floor(cdf * 5) + 1, lit(5L)) // long, the cross-engine
    // integer type result sets agree on

    def scored(metricCol: String, scoreCol: String, invert: Boolean) = {
      val cdf = RankTransform.cdf(metrics, metricCol)
        .select(col("v"), col("cdf_mid"))
      val q = quintile(col("cdf_mid"))
      (df: DataFrame) => df
        .join(cdf, df(metricCol).cast("double") === cdf("v"))
        .withColumn(scoreCol, if (invert) lit(6L) - q else q)
        .drop("v", "cdf_mid")
    }

    val withScores = Seq(
      scored("recency_days", "r", invert = true),
      scored("frequency", "f", invert = false),
      scored("monetary_cents", "m", invert = false))
      .foldLeft(metrics)((d, fn) => fn(d))

    withScores.withColumn("segment",
      when(col("r") >= 4 && col("f") >= 4 && col("m") >= 4, "champion")
        .when(col("r") >= 4 && col("f") <= 2, "new")
        .when(col("r") <= 2 && col("f") >= 3, "at_risk")
        .when(col("r") <= 2, "hibernating")
        .when(col("f") >= 4, "loyal")
        .otherwise("regular"))
      .select(col("cust"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r"), col("f"), col("m"),
        col("segment"))
  }
}

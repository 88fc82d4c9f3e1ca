package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COEC position-bias correction (Clicks Over Expected Clicks —
  * Zhang & Jones 2007, the standard search/ads ranking-log
  * de-biasing): raw per-item CTR rewards items that were SHOWN
  * higher; COEC divides an item's clicks by the clicks its
  * impressions were EXPECTED to earn given their positions, so an
  * item clicked at position 9 outranks one merely shown at
  * position 1.
  *
  *   prior_p = clicks_p / views_p          (global position CTR)
  *   COEC_i  = clicks_i / Σ_{impressions i} prior_{p}
  *
  * Exactness: priors are µ-quantized (floor of one IEEE division of
  * exact counts) so the per-item expected-click sum is a BIGINT;
  * COEC is one closing division rounded 6 dp. Items with zero
  * expected clicks report null (stated).
  *
  * Scale shape: the position-prior table is positions-sized and
  * BROADCASTS; the log streams through one broadcast join + one
  * per-item rollup. Two passes total, both partial-aggregable.
  */
object Coec {

  /** Score items from an impression log `(itemCol, posCol, clickCol)`
    * (click = 0/1). Returns per item: views, clicks, expected_mu,
    * coec. */
  def score(
      log: DataFrame,
      itemCol: String,
      posCol: String,
      clickCol: String): DataFrame = {
    val priors = log.groupBy(col(posCol).as("p"))
      .agg(count(lit(1)).as("v_p"),
        sum(col(clickCol).cast("long")).as("c_p"))
      .select(col("p"),
        floor((col("c_p") * 1000000L).cast("double") /
          col("v_p").cast("double")).cast("long").as("prior_mu"))
    log.select(col(itemCol).as("item"), col(posCol).as("p"),
        col(clickCol).cast("long").as("click"))
      .join(broadcast(priors), Seq("p"))
      .groupBy("item")
      .agg(count(lit(1)).as("views"),
        sum(col("click")).as("clicks"),
        sum(col("prior_mu")).as("expected_mu"))
      .select(col("item"), col("views"), col("clicks"),
        col("expected_mu"),
        when(col("expected_mu") > 0,
          round((col("clicks") * 1000000L).cast("double") /
            col("expected_mu").cast("double"), 6)).as("coec"))
  }

  /** DuckDB restatement over `implog(item, p, click)`; ends in
    * `coec_out(item, views, clicks, expected_mu, coec)`. */
  def scoreSql(rel: String): String =
    s"""coec_prior AS (
       |  SELECT p, CAST(floor(CAST(sum(click) * 1000000 AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS prior_mu
       |  FROM $rel GROUP BY p
       |), coec_out AS (
       |  SELECT l.item, CAST(count(*) AS BIGINT) AS views,
       |    CAST(sum(l.click) AS BIGINT) AS clicks,
       |    CAST(sum(pr.prior_mu) AS BIGINT) AS expected_mu,
       |    CASE WHEN sum(pr.prior_mu) > 0 THEN
       |      round(CAST(sum(l.click) * 1000000 AS DOUBLE)
       |        / CAST(sum(pr.prior_mu) AS DOUBLE), 6) END AS coec
       |  FROM $rel l JOIN coec_prior pr USING (p)
       |  GROUP BY l.item
       |)""".stripMargin
}

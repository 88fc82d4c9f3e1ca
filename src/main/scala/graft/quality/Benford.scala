package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benford first-significant-digit audit (Benford 1938, Nigrini's
  * fraud-detection staple): naturally-grown magnitude data puts
  * ~30.1% of leading digits at 1, ~4.6% at 9; fabricated, capped, or
  * unit-mixed figures don't. The report is the per-digit census
  * against the Benford expectation with chi-square contributions —
  * a data-forensics gate alongside q102's outliers and q156's
  * anomalies.
  *
  * Determinism: values are POSITIVE INTEGERS (quantize money to
  * cents first); the leading digit comes from the decimal STRING
  * rendering (exact in both engines — no float log10 anywhere). The
  * nine Benford probabilities are Scala-computed constants embedded
  * as round-trip double literals in BOTH the Spark plan and the
  * generated SQL, so no engine ever evaluates log10 at query time.
  * Contributions are single-op IEEE chains on exact integers,
  * 9dp-quantized before the windowed total (q185's chi-square
  * discipline).
  *
  * Scale shape: one scan-level digit projection + one 9-row
  * partial-aggregated census; everything after lives on 9 rows.
  */
object Benford {

  /** P(digit = d) = log10(1 + 1/d), d = 1..9. */
  val P: Seq[Double] = (1 to 9).map(d => math.log10(1 + 1.0 / d))

  /** @param df source rows; `valueCol` must cast to positive BIGINT
    *   (non-positive and null rows are excluded and don't count).
    * @return (digit, n, share, expected_share, contrib, chi2_total) —
    *   all 9 digits always present.
    */
  def audit(df: DataFrame, valueCol: String): DataFrame = {
    val census = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v") > 0)
      .select(substring(col("v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
      .withColumn("p", element_at(array(P.map(lit): _*), col("digit")))
    val joined = spine.join(census, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val total = joined.agg(sum(col("n")).as("total"))
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    joined.crossJoin(broadcast(total))
      .withColumn("e", col("total").cast("double") * col("p"))
      .withColumn("share",
        round(col("n").cast("double") / col("total"), 6))
      .withColumn("contrib",
        round((col("n").cast("double") - col("e")) *
          (col("n").cast("double") - col("e")) / col("e"), 9))
      .withColumn("chi2_total",
        sum(col("contrib").cast("decimal(28,9)")).over(all).cast("double"))
      .select(col("digit"), col("n"), col("share"),
        round(col("p"), 6).as("expected_share"), col("contrib"),
        col("chi2_total"))
  }

  /** DuckDB twin over a `v(v BIGINT)` CTE, embedding the SAME
    * probability literals.
    */
  def sql(valuesCte: String): String = {
    val rows = (1 to 9).map(d => s"($d, ${P(d - 1)})").mkString(", ")
    s"""WITH v AS ($valuesCte
       |), f AS (
       |  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit
       |  FROM v WHERE v > 0
       |), c AS (
       |  SELECT digit, count(*) AS n FROM f GROUP BY 1
       |), sp AS (
       |  -- cast: DuckDB types the literal as DECIMAL, which would
       |  -- keep trailing zeros through round() and break value parity
       |  SELECT digit, CAST(p AS DOUBLE) AS p
       |  FROM (VALUES $rows) AS t(digit, p)
       |), j AS (
       |  SELECT sp.digit, sp.p, COALESCE(n, 0) AS n
       |  FROM sp LEFT JOIN c ON sp.digit = c.digit
       |), tt AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS total FROM j
       |), d AS (
       |  SELECT digit, n, p, CAST(total AS DOUBLE) * p AS e,
       |    round(CAST(n AS DOUBLE) / total, 6) AS share
       |  FROM j, tt
       |), e AS (
       |  SELECT digit, n, share, round(p, 6) AS expected_share,
       |    round((CAST(n AS DOUBLE) - e) * (CAST(n AS DOUBLE) - e) / e, 9)
       |      AS contrib
       |  FROM d
       |)
       |SELECT digit, n, share, expected_share, contrib,
       |  CAST(sum(CAST(contrib AS DECIMAL(28,9))) OVER () AS DOUBLE)
       |    AS chi2_total
       |FROM e ORDER BY digit""".stripMargin
  }
}

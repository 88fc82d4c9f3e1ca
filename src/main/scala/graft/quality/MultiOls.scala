package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-series TWO-feature linear regression via closed-form normal
  * equations (the controlled-trend upgrade of q176: "is revenue
  * drifting over time AFTER controlling for volume" — one feature
  * absorbs the confounder, the other answers the question). Solves
  * the 3×3 system X'X·b = X'y by Cramer's rule, so like Trend.ols it
  * is ONE partial-aggregatable moments pass and a fixed arithmetic
  * tree — no iterative solver, no driver-side matrix library.
  *
  * Exactness: x1, x2 are integers and y quantizes to integer cents,
  * so all nine moment sums are EXACT integer aggregates — cross-row
  * order never matters. First-order and cross moments ride BIGINT;
  * Σy² rides DECIMAL(38,0) (cents² outgrows BIGINT at warehouse
  * scale — the decimal sum stays exact and engine-portable). The
  * Cramer determinants then run an identical double chain in both
  * engines over identical inputs.
  *
  * Degenerate series — under-determined (n < 4), collinear features
  * (det = 0), or zero y-variance — surface null coefficients, not a
  * division blow-up.
  */
object MultiOls {

  /** 3×3 determinant of rows (a b c / d e f / g h i) — the one
    * shared arithmetic shape, written once so Spark and the SQL twin
    * cannot drift apart structurally.
    */
  private def det3(a: Column, b: Column, c: Column, d: Column, e: Column,
      f: Column, g: Column, h: Column, i: Column): Column =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

  /** @param daily (series, x1, x2, value) — one row per series-unit,
    *   x1/x2 integer features, value in display units (quantized to
    *   cents internally).
    * @return (series, n_rows, b0, b1, b2, r2) — coefficients in
    *   display units (b1 per unit x1, b2 per unit x2), 6dp.
    */
  def fit(daily: DataFrame): DataFrame = {
    val q = daily.select(col("series"),
      col("x1").cast("long").as("x1"), col("x2").cast("long").as("x2"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("y"))
    val m = q.groupBy("series").agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum((col("y").cast("decimal(19,0)") * col("y").cast("decimal(19,0)")))
        .as("syy"))
    def d(name: String): Column = col(name).cast("double")
    val det = det3(d("n"), d("sx1"), d("sx2"),
      d("sx1"), d("s11"), d("s12"),
      d("sx2"), d("s12"), d("s22"))
    val b0 = det3(d("sy"), d("sx1"), d("sx2"),
      d("s1y"), d("s11"), d("s12"),
      d("s2y"), d("s12"), d("s22")) / det
    val b1 = det3(d("n"), d("sy"), d("sx2"),
      d("sx1"), d("s1y"), d("s12"),
      d("sx2"), d("s2y"), d("s22")) / det
    val b2 = det3(d("n"), d("sx1"), d("sy"),
      d("sx1"), d("s11"), d("s1y"),
      d("sx2"), d("s12"), d("s2y")) / det
    val sse = d("syy") - b0 * d("sy") - b1 * d("s1y") - b2 * d("s2y")
    val sst = d("syy") - d("sy") * d("sy") / d("n")
    val ok = col("n") >= 4 && det =!= 0.0
    m.select(col("series"), col("n").as("n_rows"),
      when(ok, round(b0 / 100.0, 6)).as("b0"),
      when(ok, round(b1 / 100.0, 6)).as("b1"),
      when(ok, round(b2 / 100.0, 6)).as("b2"),
      when(ok && sst > 0, round(lit(1.0) - sse / sst, 6)).as("r2"))
  }

  /** The oracle twin: DuckDB SQL computing the same moments and the
    * same Cramer chain over a `daily(series, x1, x2, value)` CTE the
    * caller supplies. Generated from the same det3 shape so the two
    * engines cannot drift structurally.
    */
  def sql(dailyCte: String): String = {
    def det3s(a: String, b: String, c: String, d: String, e: String,
        f: String, g: String, h: String, i: String): String =
      s"$a * ($e * $i - $f * $h) - $b * ($d * $i - $f * $g) + " +
        s"$c * ($d * $h - $e * $g)"
    val det = det3s("n", "sx1", "sx2", "sx1", "s11", "s12",
      "sx2", "s12", "s22")
    val n0 = det3s("sy", "sx1", "sx2", "s1y", "s11", "s12",
      "s2y", "s12", "s22")
    val n1 = det3s("n", "sy", "sx2", "sx1", "s1y", "s12",
      "sx2", "s2y", "s22")
    val n2 = det3s("n", "sx1", "sy", "sx1", "s11", "s1y",
      "sx2", "s12", "s2y")
    s"""WITH daily AS ($dailyCte
       |), q AS (
       |  SELECT series, CAST(x1 AS BIGINT) AS x1, CAST(x2 AS BIGINT) AS x2,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
       |  FROM daily
       |), m AS (
       |  SELECT series, CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(x1) AS DOUBLE) AS sx1, CAST(sum(x2) AS DOUBLE) AS sx2,
       |    CAST(sum(y) AS DOUBLE) AS sy,
       |    CAST(sum(x1 * x1) AS DOUBLE) AS s11,
       |    CAST(sum(x1 * x2) AS DOUBLE) AS s12,
       |    CAST(sum(x2 * x2) AS DOUBLE) AS s22,
       |    CAST(sum(x1 * y) AS DOUBLE) AS s1y,
       |    CAST(sum(x2 * y) AS DOUBLE) AS s2y,
       |    CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
       |      AS DOUBLE) AS syy,
       |    count(*) AS n_rows
       |  FROM q GROUP BY series
       |), c AS (
       |  SELECT series, n_rows, n, sy, s1y, s2y, syy,
       |    $det AS det,
       |    ($n0) / ($det) AS b0,
       |    ($n1) / ($det) AS b1,
       |    ($n2) / ($det) AS b2
       |  FROM m
       |), r AS (
       |  SELECT series, n_rows, det, b0, b1, b2,
       |    syy - b0 * sy - b1 * s1y - b2 * s2y AS sse,
       |    syy - sy * sy / n AS sst
       |  FROM c
       |)
       |SELECT series, n_rows,
       |  CASE WHEN n_rows >= 4 AND det <> 0
       |    THEN round(b0 / 100.0, 6) END AS b0,
       |  CASE WHEN n_rows >= 4 AND det <> 0
       |    THEN round(b1 / 100.0, 6) END AS b1,
       |  CASE WHEN n_rows >= 4 AND det <> 0
       |    THEN round(b2 / 100.0, 6) END AS b2,
       |  CASE WHEN n_rows >= 4 AND det <> 0 AND sst > 0
       |    THEN round(1.0 - sse / sst, 6) END AS r2
       |FROM r
       |ORDER BY series""".stripMargin
  }
}

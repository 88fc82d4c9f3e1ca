package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling-origin forecast backtest scorecard — score [[Ewma.holt]]'s
  * one-step-ahead forecasts against the realized series (every fc_t
  * was computed BEFORE seeing x_t, so the in-sample trajectory IS an
  * honest rolling-origin backtest; the standard pre-deployment gate
  * for a forecaster, and the accuracy context for q270's conformal
  * bands).
  *
  * Metrics per series: MAE and sMAPE. The first observation is
  * excluded (its "forecast" is the seed value itself, not a
  * prediction).
  *
  * Exactness: errors live in the forecaster's own µ-fixed-point
  * units (err_µ = |x·scale − fc| is BIGINT); each sMAPE term is
  * floor-µ-quantized BEFORE the sum; both metrics close with one
  * division rounded 6 dp. Both-zero days contribute a zero sMAPE
  * term (stated convention).
  *
  * Scale shape: one keyed join of forecasts back to the series and
  * one per-series rollup — partial-aggregable, series-parallel.
  */
object ForecastEval {

  /** Score `holtOut` (g, t, forecast_fp — [[Ewma.holt]] output at
    * `scale`) against `series` (g, t, x). Returns per g:
    * (g, n_scored, mae, smape). */
  def holtScorecard(
      holtOut: DataFrame,
      series: DataFrame,
      scale: Long = 1000000L): DataFrame = {
    val first = series.groupBy("g").agg(min(col("t")).as("t0"))
    val scored = series
      .join(holtOut.select(col("g"), col("t"), col("forecast_fp")),
        Seq("g", "t"))
      .join(first, Seq("g"))
      .filter(col("t") > col("t0"))
      .withColumn("x_mu", col("x") * scale)
      .withColumn("err_mu", abs(col("x_mu") - col("forecast_fp")))
      .withColumn("den_mu",
        abs(col("x_mu")) + abs(col("forecast_fp")))
      .withColumn("smape_term_mu",
        when(col("den_mu") === 0, 0L).otherwise(
          floor((col("err_mu") * 2000000L).cast("double") /
            col("den_mu").cast("double")).cast("long")))
    scored.groupBy("g")
      .agg(count(lit(1)).as("n_scored"),
        sum(col("err_mu")).as("sum_err_mu"),
        sum(col("smape_term_mu")).as("sum_smape_mu"))
      .select(col("g"), col("n_scored"),
        round(col("sum_err_mu").cast("double") /
          (col("n_scored").cast("double") * scale), 6).as("mae"),
        round(col("sum_smape_mu").cast("double") /
          (col("n_scored").cast("double") * 1000000L), 6).as("smape"))
  }

  /** Seasonal-naive baseline scorecard — fc_t = x_{t−lag} (the
    * forecast every model must BEAT; MASE's denominator): same
    * integer-quantized MAE/sMAPE as [[holtScorecard]], column-
    * compatible so the two tables line up side by side. */
  def seasonalNaiveScorecard(
      series: DataFrame,
      lag: Int = 7): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("t")
    val scored = series
      .withColumn("x_lag", org.apache.spark.sql.functions
        .lag(col("x"), lag).over(w))
      .filter(col("x_lag").isNotNull)
      .withColumn("err", abs(col("x") - col("x_lag")))
      .withColumn("den", abs(col("x")) + abs(col("x_lag")))
      .withColumn("smape_term_mu",
        when(col("den") === 0, 0L).otherwise(
          floor((col("err") * 2000000L).cast("double") /
            col("den").cast("double")).cast("long")))
    scored.groupBy("g")
      .agg(count(lit(1)).as("n_scored"),
        sum(col("err")).as("sum_err"),
        sum(col("smape_term_mu")).as("sum_smape_mu"))
      .select(col("g"), col("n_scored"),
        round(col("sum_err").cast("double") /
          col("n_scored").cast("double"), 6).as("mae"),
        round(col("sum_smape_mu").cast("double") /
          (col("n_scored").cast("double") * 1000000L), 6).as("smape"))
  }

  /** DuckDB restatement over `daily(g, day, x)`; ends in
    * `nv_out(g, n_scored, mae, smape)`. */
  def seasonalNaiveSql(lag: Int = 7): String =
    s"""nv_l AS (
       |  SELECT g, x, lag(x, $lag) OVER (PARTITION BY g ORDER BY day)
       |    AS x_lag
       |  FROM daily
       |), nv_s AS (
       |  SELECT g, abs(x - x_lag) AS err,
       |    abs(x) + abs(x_lag) AS den
       |  FROM nv_l WHERE x_lag IS NOT NULL
       |), nv_out AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_scored,
       |    round(CAST(sum(err) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE), 6) AS mae,
       |    round(CAST(sum(CASE WHEN den = 0 THEN 0 ELSE
       |        CAST(floor(CAST(err * 2000000 AS DOUBLE)
       |          / CAST(den AS DOUBLE)) AS BIGINT) END) AS DOUBLE)
       |      / (CAST(count(*) AS DOUBLE) * 1000000), 6) AS smape
       |  FROM nv_s GROUP BY g
       |)""".stripMargin

  /** DuckDB restatement over `rec(g, day, x, i, …, fc)` (the shared
    * Holt recursion CTE, scale 1e6); ends in
    * `fc_out(g, n_scored, mae, smape)`. */
  def holtScorecardSql: String =
    """fc_scored AS (
      |  SELECT g,
      |    abs(x * 1000000 - fc) AS err_mu,
      |    abs(x * 1000000) + abs(fc) AS den_mu
      |  FROM rec WHERE i > 1
      |), fc_terms AS (
      |  SELECT g, err_mu,
      |    CASE WHEN den_mu = 0 THEN 0 ELSE
      |      CAST(floor(CAST(err_mu * 2000000 AS DOUBLE)
      |        / CAST(den_mu AS DOUBLE)) AS BIGINT) END AS smape_term_mu
      |  FROM fc_scored
      |), fc_out AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n_scored,
      |    round(CAST(sum(err_mu) AS DOUBLE)
      |      / (CAST(count(*) AS DOUBLE) * 1000000), 6) AS mae,
      |    round(CAST(sum(smape_term_mu) AS DOUBLE)
      |      / (CAST(count(*) AS DOUBLE) * 1000000), 6) AS smape
      |  FROM fc_terms GROUP BY g
      |)""".stripMargin
}

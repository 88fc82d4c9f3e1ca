package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonality / trend STRENGTH indices over an [[Stl]] decomposition
  * (Hyndman & Wang 2015's F_s / F_t — the features `tsfeatures`
  * ships and every series triage dashboard sorts by):
  *
  *   F_seasonal = max(0, 1 − Var(R) / Var(S + R))
  *   F_trend    = max(0, 1 − Var(R) / Var(T + R))
  *
  * A flat series scores ~0 on both; a clean weekly pattern pushes
  * F_seasonal toward 1.
  *
  * Exactness: Stl's components are integer-SCALED (×14 resid/
  * seasonal, ×7 trend — 2·trend_c7 puts trend in the same ×14
  * units), so every variance is the integer identity
  * n·Σx² − (Σx)² over DECIMAL(38,0) sums; the scale factor cancels
  * in each ratio and the two indices are fixed double chains
  * rounded 6 dp. Series with zero denominator variance report null
  * (stated).
  *
  * Scale shape: one groupBy over Stl's output rows — adds nothing to
  * Stl's own window passes.
  */
object StlStrength {

  /** Strength indices per series from [[Stl.decompose]] output
    * (g, day, x, trend_c7, seasonal_m14, resid_m14). Edge days
    * (null trend) are excluded, like Stl itself states. */
  def indices(stl: DataFrame, gCol: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val base = stl.filter(col("trend_c7").isNotNull)
      .select(col(gCol).as("g"),
        dec(col("resid_m14")).as("r"),
        dec(col("seasonal_m14") + col("resid_m14")).as("sr"),
        dec(col("trend_c7") * 2 + col("resid_m14")).as("tr"))
    val sums = base.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(col("r")).as("s_r"), sum(col("r") * col("r")).as("s_rr"),
      sum(col("sr")).as("s_s"), sum(col("sr") * col("sr")).as("s_ss"),
      sum(col("tr")).as("s_t"), sum(col("tr") * col("tr")).as("s_tt"))
    def varNum(s2: org.apache.spark.sql.Column,
        s1: org.apache.spark.sql.Column) =
      col("n").cast("double") * s2.cast("double") -
        s1.cast("double") * s1.cast("double")
    val vR = varNum(col("s_rr"), col("s_r"))
    val vSR = varNum(col("s_ss"), col("s_s"))
    val vTR = varNum(col("s_tt"), col("s_t"))
    sums.select(col("g"), col("n").as("n_days"),
      when(vSR > 0, round(greatest(lit(0.0), lit(1.0) - vR / vSR), 6))
        .as("f_seasonal"),
      when(vTR > 0, round(greatest(lit(0.0), lit(1.0) - vR / vTR), 6))
        .as("f_trend"))
  }

  /** DuckDB restatement over `stl_out` (the [[Stl.decomposeSql]]
    * terminal CTE); ends in
    * `strength_out(g, n_days, f_seasonal, f_trend)`. */
  def indicesSql: String =
    """str_base AS (
      |  SELECT g, CAST(resid_m14 AS HUGEINT) AS r,
      |    CAST(seasonal_m14 + resid_m14 AS HUGEINT) AS sr,
      |    CAST(trend_c7 * 2 + resid_m14 AS HUGEINT) AS tr
      |  FROM stl_out WHERE trend_c7 IS NOT NULL
      |), str_sums AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n,
      |    sum(r) AS s_r, sum(r * r) AS s_rr,
      |    sum(sr) AS s_s, sum(sr * sr) AS s_ss,
      |    sum(tr) AS s_t, sum(tr * tr) AS s_tt
      |  FROM str_base GROUP BY g
      |), strength_out AS (
      |  SELECT g, n AS n_days,
      |    CASE WHEN CAST(n AS DOUBLE) * CAST(s_ss AS DOUBLE)
      |        - CAST(s_s AS DOUBLE) * CAST(s_s AS DOUBLE) > 0 THEN
      |      round(greatest(0.0, 1.0
      |        - (CAST(n AS DOUBLE) * CAST(s_rr AS DOUBLE)
      |            - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE))
      |          / (CAST(n AS DOUBLE) * CAST(s_ss AS DOUBLE)
      |            - CAST(s_s AS DOUBLE) * CAST(s_s AS DOUBLE))), 6)
      |    END AS f_seasonal,
      |    CASE WHEN CAST(n AS DOUBLE) * CAST(s_tt AS DOUBLE)
      |        - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) > 0 THEN
      |      round(greatest(0.0, 1.0
      |        - (CAST(n AS DOUBLE) * CAST(s_rr AS DOUBLE)
      |            - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE))
      |          / (CAST(n AS DOUBLE) * CAST(s_tt AS DOUBLE)
      |            - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE))), 6)
      |    END AS f_trend
      |  FROM str_sums
      |)""".stripMargin
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average per series — the metric
  * smoother behind alerting baselines and trend dashboards, next to
  * [[GapFill]]'s fills and [[graft.quality.Cusum]]'s shift detector
  * (CUSUM finds the break; EWMA is the operational baseline it
  * breaks FROM).
  *
  * Reproducibility: the recursion s_t = (1−α)·s_{t−1} + α·x_t is
  * evaluated in INTEGER FIXED-POINT — level = value · scale, α =
  * alphaNum/alphaDen, floor division at every step (the
  * [[PageRank]] discipline):
  *   s_0 = x_0·scale
  *   s_t = (s_{t−1}·(alphaDen−alphaNum) + x_t·scale·alphaNum) div alphaDen
  * Every intermediate is a BIGINT, so the trajectory is bit-exact in
  * any engine — no float accumulation order to disagree about.
  * Inputs must be non-negative integers (floor = truncation there;
  * quantize to cents first).
  *
  * Scale shape: a groupBy collects each series into one ordered
  * array and folds it with a single Catalyst `aggregate` expression
  * — the recursion is inherently sequential per series, so the
  * per-series array is the honest unit of work. Series count scales
  * out across the cluster; series LENGTH is calendar-bounded (the
  * [[Acf]] contract), which is what keeps the per-task array small.
  * No driver state, no UDF, no window over a whole series.
  */
object Ewma {

  /** @param df (g, t, x): series key, integer time index,
    *   non-negative integer value.
    * @return (g, t, level_fp, level): fixed-point level (× scale)
    *   and its decimal rendering.
    */
  def smooth(df: DataFrame, alphaNum: Long, alphaDen: Long,
      scale: Long = 1000000L): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be in (0,1): $alphaNum/$alphaDen")
    val keep = alphaDen - alphaNum
    val packed = df
      .select(col("g"), col("t").cast("long"), col("x").cast("long"))
      .groupBy("g")
      .agg(array_sort(collect_list(struct(col("t"), col("x")))).as("xs"))
    val folded = packed.withColumn("lvls", expr(
      s"""aggregate(xs,
         |  cast(array() as array<struct<t: bigint, lvl: bigint>>),
         |  (acc, e) -> array_append(acc, named_struct('t', e.t, 'lvl',
         |    case when size(acc) = 0 then e.x * ${scale}L
         |    else (element_at(acc, -1).lvl * ${keep}L
         |      + e.x * ${scale}L * ${alphaNum}L) div ${alphaDen}L
         |    end)))""".stripMargin))
    folded.select(col("g"), explode(col("lvls")).as("s"))
      .select(col("g"), col("s.t").as("t"),
        col("s.lvl").as("level_fp"),
        round(col("s.lvl") / lit(scale.toDouble), 6).as("level"))
  }

  /** Holt double-exponential smoothing — the level+TREND upgrade of
    * [[smooth]] (a plain EWMA lags a ramping series forever; Holt's
    * trend term closes the gap, which is what makes it the standard
    * short-horizon forecaster for capacity metrics):
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    * seeded l_0 = x_0, b_0 = 0 (the first observations warm the
    * trend up from zero — documented contract, not a hidden choice).
    *
    * Same fixed-point reproducibility as [[smooth]], with one twist:
    * the TREND is signed, so the recursion uses integral division
    * that TRUNCATES TOWARD ZERO — Spark's `div` and DuckDB's `//`
    * agree on that convention for negatives (verified, not assumed),
    * which keeps the whole trajectory bit-exact cross-engine without
    * any floor-correction arithmetic.
    *
    * Also emits `forecast_fp` = l_{t−1} + b_{t−1}, the one-step-ahead
    * prediction the observation at t is judged against (the residual
    * feed for [[graft.quality.Cusum]]-style alerting).
    */
  def holt(df: DataFrame, alphaNum: Long, alphaDen: Long,
      betaNum: Long, betaDen: Long, scale: Long = 1000000L): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be in (0,1): $alphaNum/$alphaDen")
    require(betaNum > 0 && betaNum < betaDen,
      s"beta must be in (0,1): $betaNum/$betaDen")
    val ka = alphaDen - alphaNum
    val kb = betaDen - betaNum
    val packed = df
      .select(col("g"), col("t").cast("long"), col("x").cast("long"))
      .groupBy("g")
      .agg(array_sort(collect_list(struct(col("t"), col("x")))).as("xs"))
    // acc rows: (t, lvl, trd, fc); fc = level+trend BEFORE seeing x_t
    val folded = packed.withColumn("hs", expr(
      s"""aggregate(xs,
         |  cast(array() as array<struct<t: bigint, lvl: bigint,
         |    trd: bigint, fc: bigint>>),
         |  (acc, e) -> case when size(acc) = 0
         |    then array(named_struct('t', e.t, 'lvl', e.x * ${scale}L,
         |      'trd', 0L, 'fc', e.x * ${scale}L))
         |    else array_append(acc, named_struct(
         |      't', e.t,
         |      'lvl', (e.x * ${scale}L * ${alphaNum}L
         |        + (element_at(acc, -1).lvl + element_at(acc, -1).trd)
         |          * ${ka}L) div ${alphaDen}L,
         |      'trd', (((e.x * ${scale}L * ${alphaNum}L
         |          + (element_at(acc, -1).lvl + element_at(acc, -1).trd)
         |            * ${ka}L) div ${alphaDen}L
         |        - element_at(acc, -1).lvl) * ${betaNum}L
         |        + element_at(acc, -1).trd * ${kb}L) div ${betaDen}L,
         |      'fc', element_at(acc, -1).lvl + element_at(acc, -1).trd))
         |    end)""".stripMargin))
    folded.select(col("g"), explode(col("hs")).as("s"))
      .select(col("g"), col("s.t").as("t"),
        col("s.lvl").as("level_fp"), col("s.trd").as("trend_fp"),
        col("s.fc").as("forecast_fp"),
        round(col("s.lvl") / lit(scale.toDouble), 6).as("level"),
        round(col("s.trd") / lit(scale.toDouble), 6).as("trend"))
  }
}

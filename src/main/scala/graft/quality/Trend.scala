package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-series linear trend via closed-form OLS (the "is this metric
  * drifting and how fast" report completing the monitoring family:
  * q156 flags spikes, q170 flags level shifts, this quantifies slow
  * drift with a rate and a fit quality):
  *   slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
  *   intercept = (Σy − slope·Σx) / n
  *   r²        = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
  *
  * Exactness: x is the integer day bucket and y integer cents
  * (q156's quantization), so all five moment sums are EXACT BIGINTs
  * from one partial-aggregatable pass — cross-row order never
  * matters; the closed form then runs an identical double-division
  * chain in both engines (squares computed in double — the exact
  * integer differences stay < 2^53, their squares need not).
  *
  * Degenerate series (single day, or zero x/y variance) surface
  * null slope/intercept/r² rather than a division blow-up.
  */
object Trend {

  /** @param daily (series, day, value) — one row per series-day.
    * @return (series, n_days, slope, intercept, r2) — slope in
    *         display units per day, 6dp.
    */
  def ols(daily: DataFrame): DataFrame = {
    val q = daily.select(col("series"), col("day").cast("long").as("x"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("y"))
    val m = q.groupBy("series").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val denX = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val denY = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val slope = num / denX
    val intercept = (col("sy").cast("double") - slope * col("sx")) / col("n")
    m.select(col("series"), col("n").as("n_days"),
      when(col("n") >= 2 && denX > 0,
        round(slope / 100.0, 6)).as("slope"),
      when(col("n") >= 2 && denX > 0,
        round(intercept / 100.0, 6)).as("intercept"),
      when(col("n") >= 2 && denX > 0 && denY > 0,
        round(num * num / (denX * denY), 6)).as("r2"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonality-adjusted anomaly days — the operational composition
  * of [[Seasonal]]'s weekday profile with a z-score residual test:
  * "Tuesday was low FOR A TUESDAY". Each day's value is scored
  * against its own (series, weekday) population,
  *
  *   z = (x − µ_w) / σ_w,   σ²_w = (n_w·Σx² − S_w²) / n_w²
  *
  * which a raw global threshold gets wrong in both directions
  * (flags every quiet Sunday, misses a weak Monday).
  *
  * Determinism: moments are exact integer sums per (series,
  * weekday); µ, σ, z are a fixed double chain over them, z rounded
  * to 6. Degenerate populations (σ = 0 or a single day) report null
  * z and never flag.
  *
  * Scale shape: one (series, weekday) moments groupBy (partial-
  * aggregated, ≤ 7 rows per series) broadcast-joined back onto the
  * daily rows — a projection, no second shuffle of the data.
  */
object SeasonalAnomaly {

  /** @param df (g, day, x): series, epoch-day, integer-unit value
    *   (zero-fill calendar gaps first — the [[Seasonal]] contract).
    * @param k flag |z| > k.
    * @return flagged days only: (g, day, dow, x, mean_w, z).
    */
  def flag(df: DataFrame, k: Double = 3.0): DataFrame = {
    val d = df.select(col("g"), col("day").cast("long"),
      pmod(col("day").cast("long") + 3, lit(7)).as("dow"),
      col("x").cast("long"))
    val mom = d.groupBy("g", "dow").agg(
      count(lit(1)).as("nw"),
      sum(col("x")).as("sw"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("qw"))
    val nD = col("nw").cast("double")
    val mean = col("sw").cast("double") / nD
    val varW = (col("nw").cast("decimal(38,0)") * col("qw")
      - col("sw").cast("decimal(38,0)") * col("sw")).cast("double") /
      (nD * nD)
    val z = (col("x").cast("double") - mean) / sqrt(varW)
    d.join(broadcast(mom), Seq("g", "dow"))
      .withColumn("mean_w", round(mean, 6))
      .withColumn("z", when(col("nw") > 1 && varW > 0, round(z, 6)))
      .filter(abs(col("z")) > k)
      .select(col("g"), col("day"), col("dow"), col("x"),
        col("mean_w"), col("z"))
  }
}

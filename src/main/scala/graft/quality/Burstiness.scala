package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-entity activity dispersion — the Fano factor (index of
  * dispersion) of daily event counts,
  *
  *   F = Var(c) / Mean(c) = (n·Σc² − S²) / (n·S)
  *
  * over the shared n-day calendar. A Poisson-like organic user sits
  * near F ≈ 1; schedulers and drip bots sit near 0 (metronome);
  * scrapers and incident bursts push F ≫ 1 — the classic
  * bot/abuse triage signal next to [[Anomaly]]'s metric-level
  * detection and [[graft.ops.Sessionize]]'s session cuts.
  *
  * Exactness: S and Σc² are exact integer sums (days with zero
  * events contribute nothing to either, so only active days need
  * rows — the zero-filled spine is implicit in the shared n); F is
  * ONE double division of exact integers, unrounded. n (the
  * calendar length) is a broadcast scalar.
  *
  * Scale shape: one (entity, day) count groupBy, one per-entity
  * rollup — both partial-aggregated, keyed shuffles only.
  */
object Burstiness {

  /** @param df (id, day): entity key, epoch-day of each event.
    * @param minEvents report only entities with ≥ minEvents total.
    * @param tau flag entities with F > tau.
    * @return (id, n_events, n_active_days, fano, bursty).
    */
  def fano(df: DataFrame, minEvents: Long = 1, tau: Double = 2.0): DataFrame = {
    val daily = df.groupBy("id", "day").agg(count(lit(1)).as("c"))
    val spine = daily.agg((max("day") - min("day") + 1)
      .cast("decimal(38,0)").as("n"))
    val per = daily.groupBy("id").agg(
      sum(col("c")).as("s"),
      count(lit(1)).as("n_active_days"),
      sum(col("c").cast("decimal(38,0)") * col("c")).as("scc"))
    per.filter(col("s") >= minEvents)
      .crossJoin(broadcast(spine))
      .withColumn("fano",
        (col("n") * col("scc") - col("s").cast("decimal(38,0)")
          * col("s")).cast("double") /
          (col("n") * col("s").cast("decimal(38,0)")).cast("double"))
      .select(col("id"), col("s").as("n_events"), col("n_active_days"),
        col("fano"), (col("fano") > tau).as("bursty"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival curve (Kaplan & Meier 1958) — the
  * product-limit estimator behind every churn/retention duration
  * readout ("what fraction of users survive past day t?"), the
  * censoring-aware upgrade of [[Retention]]-style cohort grids: a
  * user still active at the observation cutoff is CENSORED, not a
  * churn event, and dropping or miscounting them biases the curve —
  * KM is precisely the estimator that uses their partial lifetime.
  *
  *   S(t) = Π_{u ≤ t, d_u > 0} (1 − d_u / n_u)
  *
  * with d_u events at duration u and n_u subjects still at risk
  * (duration ≥ u; standard tie convention — subjects censored AT u
  * count at risk at u).
  *
  * Determinism: counts are exact integers from two keyed
  * aggregations; each step's log-factor ln(n_u − d_u) − ln(n_u) is
  * µ-quantized to 12dp BEFORE the decimal-exact cumulative sum (the
  * [[graft.quality.Entropy]] discipline), so the reported
  * `log_survival` is bit-exact cross-engine; `survival` closes with
  * one exp rounded to 6dp.
  *
  * 100 TB shape: subjects collapse to per-(group, duration) event/
  * censor counts in one partial-aggregatable pass; at-risk counts
  * and the cumulative log ride two windows partitioned by group
  * over DISTINCT DURATIONS only (calendar-bounded, the [[Acf]]
  * per-series contract — thousands of rows per group, not
  * subjects). Output ∝ groups × distinct event durations.
  */
object Survival {

  /** @param df (g, dur, ev): group, non-negative integer duration,
    *   event flag (1 = event observed at dur, 0 = censored at dur).
    * @return (g, t, n_risk, d_events, c_censored, log_survival,
    *   survival) — one row per duration with at least one EVENT
    *   (survival only steps at event times; censor-only durations
    *   fold into the at-risk accounting, as KM prescribes).
    */
  def kaplanMeier(df: DataFrame): DataFrame = {
    val cnt = df
      .select(col("g"), col("dur").cast("long").as("t"),
        col("ev").cast("long").as("ev"))
      .groupBy("g", "t")
      .agg(sum(col("ev")).as("d"),
        sum(lit(1L) - col("ev")).as("c"),
        count(lit(1)).as("m"))
    // at risk at t = subjects with duration >= t: total minus the
    // running count of subjects that left strictly before t
    val wAll = Window.partitionBy("g")
    val wCum = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val risked = cnt
      .withColumn("n_risk",
        sum(col("m")).over(wAll) -
          coalesce(sum(col("m")).over(wCum), lit(0L)))
    // µ-quantized per-step log factor, decimal-exact running sum.
    // n_risk = d (everyone remaining dies here) has log factor −∞;
    // that row is necessarily the GROUP'S LAST (no subject outlives
    // t), so it needs no propagation: the row itself reports NULL
    // log_survival and survival 0 by contract, and its step
    // contributes 0 to a cumulative nothing reads past it.
    val dec = "decimal(28,12)"
    val total = col("d") > 0 && col("n_risk") === col("d")
    val step = when(col("d") > 0 && col("n_risk") > col("d"),
        round(log(col("n_risk") - col("d")) - log(col("n_risk")), 12)
          .cast(dec))
      .otherwise(lit(0).cast(dec))
    val wLog = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risked
      .withColumn("log_survival",
        when(total, lit(null).cast("decimal(38,12)"))
          .otherwise(sum(step).over(wLog)))
      .filter(col("d") > 0) // curve steps only at event times
      .select(col("g"), col("t"), col("n_risk"),
        col("d").as("d_events"), col("c").as("c_censored"),
        // the cumulative stays decimal-exact internally; the OUTPUT
        // renders as a rounded double (engine decimal types don't
        // cross result boundaries identically)
        round(col("log_survival").cast("double"), 9).as("log_survival"),
        when(col("log_survival").isNotNull,
          round(exp(col("log_survival").cast("double")), 6))
          .otherwise(lit(0.0)).as("survival"))
  }
}

package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (monotone) calibration of a binned model score —
  * Zadrozny & Elkan 2002, the standard "does score 0.8 actually
  * mean 80%?" curve behind every production classifier dashboard:
  * observed positive rates per score bin are noisy and locally
  * non-monotone; the isotonic fit is the closest (least-squares)
  * NON-DECREASING curve, pooling adjacent violators.
  *
  * Instead of the sequential PAVA stack — a per-row loop — the fit
  * uses the closed-form MINIMAX characterization over the SAME
  * solution (Robertson, Wright & Dykstra 1988, thm 1.4.4):
  *
  *   fit(i) = max_{j ≤ i} min_{k ≥ i} avg(y[j..k])
  *
  * which is pure relational algebra once scores are binned: one
  * prefix pass over B bucket rows, the B(B+1)/2 interval averages,
  * and a grouped min-then-max. B is a calibration constant (10–50
  * bins), so everything after the one corpus pass is
  * METADATA-sized — the honest trade: binning first is what makes
  * calibration both O(1)-state and order-free, where streaming PAVA
  * over raw scores would serialize the whole corpus.
  *
  * Determinism: bucket sums are exact integers; each interval
  * average is ONE double division of exact integers (identical in
  * any engine); min/max over identical doubles are order-free. No
  * iteration, no tie-breaks.
  */
object Isotonic {

  /** @param df (bucket, y): integer score bin, 0/1 outcome.
    * @return (bucket, n, n_pos, observed, fit) — observed and the
    *   non-decreasing calibrated rate, both 9dp.
    */
  def calibrate(df: DataFrame): DataFrame = {
    val buckets = df
      .select(col("bucket").cast("long"), col("y").cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    // B bounded rows from here on: windows and crosses are metadata
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefix = buckets
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("cs", sum(col("n_pos")).over(w))
    val lo = prefix.select(col("bucket").as("j"),
      (col("cn") - col("n")).as("cn0"), (col("cs") - col("n_pos")).as("cs0"))
    val hi = prefix.select(col("bucket").as("k"),
      col("cn").as("cnk"), col("cs").as("csk"))
    val intervals = lo.crossJoin(hi).filter(col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("csk") - col("cs0")).cast("double") /
          (col("cnk") - col("cn0")).cast("double")).as("avg"))
    val minOverK = intervals
      .join(buckets.select(col("bucket").as("i")),
        col("j") <= col("i") && col("i") <= col("k"))
      .groupBy("i", "j").agg(min(col("avg")).as("mn"))
    val fit = minOverK.groupBy("i").agg(max(col("mn")).as("fit"))
    buckets.join(fit, buckets("bucket") === fit("i"))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 9)
          .as("observed"),
        round(col("fit"), 9).as("fit"))
  }
}

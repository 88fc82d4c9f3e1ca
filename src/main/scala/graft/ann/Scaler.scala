package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-dimension embedding standardization (z-score feature scaling)
  * — the prep step before distance-based retrieval when dimensions
  * have unequal spreads (raw encoder outputs often do): cosine/L2
  * otherwise let high-variance dimensions dominate the metric.
  *
  * fit() is ONE partial-aggregatable pass: posexplode to
  * (dim, value), per-dim decimal-exact power sums (the same
  * order-independent cross-engine convention as quality/Profile),
  * n·dim → dim rows. transform() applies (x−μ)/σ per element with
  * the dim-sized stats folded into LITERAL arrays — a pure per-row
  * projection, no join, no shuffle of the vector corpus (dim
  * scalars on the driver is the IVF-centroid precedent).
  */
object Scaler {

  /** Per-dimension (pos, n, mean, var, std) — exact decimal power
    * sums; float inputs cast to double losslessly first.
    */
  def fit(vecs: DataFrame, vecCol: String): DataFrame = {
    val e = vecs
      .select(posexplode(col(vecCol)).as(Seq("pos", "f")))
      .select(col("pos"), col("f").cast("double").as("v"))
    val s = col("s").cast("double")
    val sq = col("sq").cast("double")
    e.groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(28,12)")).as("s"),
        sum((col("v") * col("v")).cast("decimal(28,12)")).as("sq"))
      .select(col("pos"), col("n"),
        (s / col("n")).as("mean"),
        // clamp at 0: float cancellation on a constant dimension can
        // leave the double arithmetic at ~-1e-18, and sqrt of that is
        // NaN here and a hard error in engines that reject negative
        // sqrt (DuckDB)
        greatest((sq - s * s / col("n")) / col("n"), lit(0.0)).as("var"))
      .withColumn("std", sqrt(col("var")))
  }

  /** Per-dimension embedding DRIFT between two batches — the MLOps
    * monitor for "did the encoder (or the traffic) move": re-embedded
    * corpora, model upgrades, and feature-pipeline bugs all show up
    * as mean shift on specific dimensions long before downstream
    * metrics notice. Both sides run [[fit]]'s decimal-exact moments
    * pass; the report compares per-dim means with a 9dp-rounded
    * absolute delta and flags dims whose ROUNDED delta exceeds tau
    * (the flag compares rounded values so it is engine-portable).
    * A dimension present on one side only (a schema break, not
    * drift) surfaces as a row with null counts on the missing side
    * — visible, never silently dropped.
    */
  def drift(a: DataFrame, b: DataFrame, vecCol: String,
      tau: Double = 0.05): DataFrame = {
    require(tau > 0, s"tau must be positive, got $tau")
    val fa = fit(a, vecCol).select(col("pos"), col("n").as("n_a"),
      col("mean").as("ma"))
    val fb = fit(b, vecCol).select(col("pos").as("pos_b"),
      col("n").as("n_b"), col("mean").as("mb"))
    val j = fa.join(fb, col("pos") === col("pos_b"), "full_outer")
    j.select(coalesce(col("pos"), col("pos_b")).as("pos"),
        col("n_a"), col("n_b"),
        round(col("ma"), 9).as("mean_a"),
        round(col("mb"), 9).as("mean_b"),
        round(abs(col("ma") - col("mb")), 9).as("abs_delta"))
      .withColumn("drifted", col("abs_delta") > tau)
  }

  /** Standardize every vector with fitted stats. The stats frame is
    * dim rows — collected to literal arrays (driver-held scalars),
    * so the corpus projection is shuffle-free.
    */
  def transform(vecs: DataFrame, vecCol: String, stats: DataFrame,
      eps: Double = 1e-12): DataFrame = {
    val rows = stats.select("pos", "mean", "std").collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val means = array(rows.map(r => lit(r._2._1)): _*)
    val stds = array(rows.map(r => lit(math.max(r._2._2, eps))): _*)
    vecs.withColumn("scaled",
      zip_with(
        zip_with(col(vecCol).cast("array<double>"), means, (x, m) => x - m),
        stds, (d, sd) => d / sd))
  }
}

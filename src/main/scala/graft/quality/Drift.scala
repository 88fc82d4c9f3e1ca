package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between a baseline slice and a
  * current slice of the same column — the data-quality check a
  * pipeline runs before trusting a new batch ("did totals shift?
  * did a source silently change units?"). Metric: PSI (population
  * stability index), the banking-standard per-bin
  * (q−p)·ln(q/p) sum; > 0.2 is the conventional "investigate" line.
  *
  * Bins are FIXED-WIDTH from caller-supplied bounds — deterministic
  * across runs and engines, unlike quantile bins whose sampled edges
  * reshuffle every run. Out-of-range values clamp into the edge
  * bins, so no row is silently dropped. Laplace smoothing (+0.5 per
  * bin) keeps empty bins finite without hiding them.
  *
  * 100 TB shape: each slice is ONE partial-aggregatable groupBy on
  * the bin id (≤ nBins rows out of every map task); the PSI join is
  * nBins × nBins rows. Nothing about the data size reaches the
  * driver.
  */
object Drift {

  /** Bin index for `v`: clamp(floor((v − lo) / width), 0, nBins−1). */
  def binCol(v: Column, lo: Double, hi: Double, nBins: Int): Column = {
    require(nBins > 0 && hi > lo, "need hi > lo and nBins > 0")
    val width = (hi - lo) / nBins
    least(greatest(floor((v - lit(lo)) / lit(width)).cast("long"), lit(0L)),
      lit(nBins - 1L))
  }

  /** Per-bin drift table: (bin, n_base, n_cur, p, q, psi_contrib),
    * one row per bin (empty bins included). Total PSI =
    * sum(psi_contrib); kept per-bin so the consumer sees WHERE the
    * distribution moved, not just that it did.
    */
  def psi(
      baseline: DataFrame,
      current: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      nBins: Int): DataFrame = {
    val spark = baseline.sparkSession
    def binned(df: DataFrame, as: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .groupBy(binCol(col(valueCol), lo, hi, nBins).as("bin"))
        .agg(count(lit(1)).as(as))
    val bins = spark.range(0, nBins).select(col("id").as("bin"))
    val joined = bins
      .join(binned(baseline, "n_base"), Seq("bin"), "left")
      .join(binned(current, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // Laplace-smoothed shares: p = (n + 0.5) / (N + 0.5·nBins).
    // N via a window over all bins (nBins rows — the window is free).
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    def share(n: Column): Column =
      (n + lit(0.5)) / (sum(n).over(all) + lit(0.5 * nBins))
    joined
      .withColumn("p", share(col("n_base")))
      .withColumn("q", share(col("n_cur")))
      .withColumn("psi_contrib",
        round((col("q") - col("p")) * log(col("q") / col("p")), 9))
      .select(col("bin"), col("n_base"), col("n_cur"),
        round(col("p"), 9).as("p"), round(col("q"), 9).as("q"),
        col("psi_contrib"))
  }

  /** Pearson chi-square homogeneity test between a baseline and a
    * current CATEGORICAL slice (PSI's sibling for discrete columns —
    * "did the event mix shift?"). Per category: expected current
    * count e = n_base · N_cur / N_base, contribution (o − e)² / e.
    *
    * Determinism: e and the contribution are single-op IEEE chains on
    * exactly-represented integer counts — bit-identical in any
    * engine; the TOTAL is a sum of µ-quantized (round-9) per-category
    * contributions, so it is order-independent too (same discipline
    * as q165's quantized ratios). Categories present in only one
    * slice are kept (o or e may be 0); a category absent from the
    * baseline has e = 0 and its contribution is defined as 0 there —
    * callers watching for NEW categories read n_base = 0 directly.
    *
    * 100 TB shape: two partial-aggregable groupBys on the category
    * (≤ |categories| rows leave each map task) and a
    * categories-sized join + window. Nothing data-sized moves.
    */
  def chiSquare(
      baseline: DataFrame,
      current: DataFrame,
      catCol: String): DataFrame = {
    def counted(df: DataFrame, as: String): DataFrame =
      df.filter(col(catCol).isNotNull)
        .groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as(as))
    val joined = counted(baseline, "n_base")
      .join(counted(current, "n_cur"), Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    joined
      .withColumn("expected",
        col("n_base").cast("double") * sum(col("n_cur")).over(all) /
          sum(col("n_base")).over(all))
      .withColumn("contrib",
        when(col("expected") > 0,
          round(
            (col("n_cur") - col("expected")) * (col("n_cur") - col("expected")) /
              col("expected"), 9))
          .otherwise(lit(0.0)))
      .withColumn("chi2_total",
        sum(col("contrib").cast("decimal(28,9)")).over(all).cast("double"))
      .select(col("category"), col("n_base"), col("n_cur"),
        round(col("expected"), 9).as("expected"), col("contrib"),
        col("chi2_total"))
  }
}

package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample A/B analysis: Welch's unequal-variance t-test per
  * stratum, the experiment-readout staple ("did variant B move the
  * metric, per segment?"). At pipeline row counts the normal
  * approximation holds, so |t| > 1.96 is the conventional 5%
  * two-sided significance line (documented approximation, not a
  * Student-t table lookup).
  *
  * Determinism: the only data-sized pass collects EXACT decimal
  * moments (n, Σv, Σv²) per (stratum, arm) — value quantizes to
  * DECIMAL(12,6), products to DECIMAL(24,12), sums are
  * order-independent. Means, variances, and the t statistic are then
  * a fixed double expression tree over those exact sums — identical
  * IEEE ops in any engine, so round-9/round-6 presentation is
  * stable.
  *
  * 100 TB shape: one partial-aggregable groupBy on the stratum;
  * 6 numbers per stratum leave each map task. Nothing else moves.
  */
object AbTest {

  def welch(
      df: DataFrame,
      stratumCol: String,
      isTreatment: Column,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(12,6)")
    val d = df.select(col(stratumCol).as("stratum"),
      isTreatment.as("is_b"), v.as("v"))
    val moments = d.groupBy("stratum").agg(
      count(when(!col("is_b"), 1)).as("n_a"),
      count(when(col("is_b"), 1)).as("n_b"),
      sum(when(!col("is_b"), col("v"))).as("s_a"),
      sum(when(col("is_b"), col("v"))).as("s_b"),
      sum(when(!col("is_b"), col("v") * col("v"))).as("q_a"),
      sum(when(col("is_b"), col("v") * col("v"))).as("q_b"))
    def mean(s: String, n: String): Column =
      col(s).cast("double") / col(n)
    def variance(q: String, s: String, n: String): Column =
      (col(q).cast("double") -
        col(s).cast("double") * col(s).cast("double") / col(n)) /
        (col(n) - 1)
    val t = (mean("s_b", "n_b") - mean("s_a", "n_a")) /
      sqrt(variance("q_b", "s_b", "n_b") / col("n_b") +
        variance("q_a", "s_a", "n_a") / col("n_a"))
    moments.select(col("stratum"), col("n_a"), col("n_b"),
      round(mean("s_a", "n_a"), 9).as("mean_a"),
      round(mean("s_b", "n_b"), 9).as("mean_b"),
      round(t, 6).as("t_stat"),
      (abs(t) > 1.96).as("significant"))
  }
}

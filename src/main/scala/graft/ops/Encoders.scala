package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical feature encoders for ML prep — the table a feature
  * pipeline materializes once and joins onto training rows, next to
  * [[graft.quality.Discretize]]'s numeric binning.
  *
  * Smoothed mean-target encoding (the Micci-Barreca 2001 empirical-
  * Bayes form): a category's encoding shrinks its observed target
  * mean toward the global mean by pseudo-count m,
  *
  *   enc(c) = (S_c + m·µ) / (n_c + m),  µ = S/N
  *          = (S_c·N + m·S) / (N·(n_c + m))
  *
  * — rare categories land near µ (no high-cardinality leakage
  * spikes), frequent ones near their own mean.
  *
  * Exactness: targets are integer units (quantize to cents first);
  * the second form is a ratio of two EXACT DECIMAL(38,0) products,
  * closed by one double division (engine-stable to the printed
  * digits). 100 TB shape: one partial-aggregable groupBy + a 1-row
  * broadcast of the global moments; output ∝ categories.
  */
object Encoders {

  /** @param df (cat, y): category, integer-unit target.
    * @return (category, n, sum_y, encoding) — the encoding table.
    */
  def meanTarget(df: DataFrame, m: Int): DataFrame = {
    require(m >= 0, s"smoothing pseudo-count must be >= 0: $m")
    val d = df.select(col("cat"), col("y").cast("long"))
    val per = d.groupBy("cat").agg(count(lit(1)).as("n"),
      sum(col("y")).as("sum_y"))
    val glob = per.agg(sum(col("n")).cast("decimal(38,0)").as("nn"),
      sum(col("sum_y")).cast("decimal(38,0)").as("ss"))
    per.crossJoin(broadcast(glob))
      .select(col("cat").as("category"), col("n"), col("sum_y"),
        round((col("sum_y").cast("decimal(38,0)") * col("nn")
            + lit(m) * col("ss")).cast("double") /
          (col("nn") * (col("n") + lit(m)).cast("decimal(38,0)"))
            .cast("double"), 6).as("encoding"))
  }
}

package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile (rank) feature transform — map every value of a column
  * to its mid-rank empirical CDF position,
  *
  *   cdf_mid(v) = (cum(v) − cnt(v)/2) / n = (2·cum(v) − cnt(v)) / (2n)
  *
  * — the scale-free monotone normalization (sklearn's
  * QuantileTransformer's first half) that makes heavy-tailed
  * features rank-comparable; ties share one mid-position. The output
  * is the DISTINCT-VALUE mapping table (value → cdf), which joins
  * back onto feature rows — at 100 TB you materialize the mapping
  * once, not a transformed copy of the corpus.
  *
  * Exactness: cum/cnt/n are exact integers; cdf_mid is one double
  * division of exact integers, unrounded.
  *
  * Scale shape: the [[RankTests]] two-level prefix — per-range-
  * bucket bases from a window over the ≤ nBuckets subtotal frame,
  * within-bucket running sums partitioned by bucket, every bucket
  * sorting in parallel. No global sort, no driver state.
  */
object RankTransform {

  private val NBuckets = 64

  /** @return (v, cnt, cum, cdf_mid) over the column's distinct
    *         values, cum inclusive.
    */
  def cdf(df: DataFrame, valueCol: String): DataFrame = {
    val perValue = df.select(col(valueCol).cast("double").as("v"))
      .na.drop(Seq("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    val bounds = perValue.agg(min("v").as("lo"), max("v").as("hi"))
    val w = when(col("hi") > col("lo"),
      (col("hi") - col("lo")) / NBuckets).otherwise(lit(1.0))
    val bucketed = perValue.crossJoin(broadcast(bounds))
      .withColumn("b", least(greatest(
        floor((col("v") - col("lo")) / w).cast("long"), lit(0L)),
        lit(NBuckets - 1L)))
      .drop("lo", "hi")
    val subtot = bucketed.groupBy("b").agg(sum("cnt").as("s"))
    val wb = Window.orderBy("b") // ≤ NBuckets rows — a bounded frame
    val bases = subtot.select(col("b"),
      (sum(col("s")).over(wb) - col("s")).as("base"))
    val total = perValue.agg(sum("cnt").as("n"))
    val wv = Window.partitionBy("b").orderBy("v")
    bucketed.join(broadcast(bases), "b")
      .withColumn("cum", col("base") + sum(col("cnt")).over(wv))
      .crossJoin(broadcast(total))
      .select(col("v"), col("cnt"), col("cum"),
        ((lit(2) * col("cum") - col("cnt")).cast("double") /
          (lit(2) * col("n")).cast("double")).as("cdf_mid"))
  }
}

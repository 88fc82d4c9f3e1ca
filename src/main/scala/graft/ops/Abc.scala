package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ABC / Pareto classification — rank entities by contribution
  * within a stratum and cut the cumulative share at the classic
  * 70/90 boundaries (A = the head that carries ≤70% of value, B =
  * up to 90%, C = the long tail). The inventory-analytics sibling of
  * q222's Gini: Gini summarizes concentration in one number, ABC
  * turns it into an actionable head/torso/tail partition.
  *
  * Exactness: classes come from the integer cross-multiplication
  * cum_before·100 < cut·total (never a float share), descending
  * value with entity-id tie-break gives a deterministic total order,
  * and the reported share is one closing division rounded 9 dp.
  *
  * Scale shape: one per-stratum window over entity TOTALS (already
  * aggregated — the window input is entities, not rows), one
  * class-sized rollup. Entity totals are the partial-aggregable
  * groupBy that precedes this.
  */
object Abc {

  /** Classify pre-aggregated entity totals
    * `(stratumCol, entityCol, centsCol)`; cuts in percent (e.g.
    * 70, 90). Returns per (stratum, class): n_entities, cents,
    * share. */
  def classify(
      totals: DataFrame,
      stratumCol: String,
      entityCol: String,
      centsCol: String,
      cutA: Int = 70,
      cutB: Int = 90): DataFrame = {
    require(0 < cutA && cutA < cutB && cutB < 100,
      s"0 < cutA < cutB < 100: $cutA, $cutB")
    val w = Window.partitionBy(stratumCol)
      .orderBy(col(centsCol).desc, col(entityCol))
    val all = Window.partitionBy(stratumCol)
    val classed = totals
      .withColumn("cum_before",
        coalesce(sum(col(centsCol)).over(w) - col(centsCol), lit(0L)))
      .withColumn("total", sum(col(centsCol)).over(all))
      .withColumn("abc_class",
        when(col("cum_before") * 100 < col("total") * cutA, "A")
          .when(col("cum_before") * 100 < col("total") * cutB, "B")
          .otherwise("C"))
    classed
      .groupBy(col(stratumCol), col("abc_class"))
      .agg(count(lit(1)).as("n_entities"),
        sum(col(centsCol)).as("cents"),
        first(col("total")).as("total"))
      .select(col(stratumCol), col("abc_class"), col("n_entities"),
        col("cents"),
        when(col("total") > 0,
          round(col("cents").cast("double") /
            col("total").cast("double"), 9)).as("share"))
  }

  /** DuckDB restatement over `totals(g, ent, cents)`; ends in
    * `abc_out(g, abc_class, n_entities, cents, share)`. */
  def classifySql(cutA: Int = 70, cutB: Int = 90): String =
    s"""abc_ranked AS (
       |  SELECT g, ent, cents,
       |    COALESCE(CAST(sum(cents) OVER
       |      (PARTITION BY g ORDER BY cents DESC, ent) AS BIGINT)
       |      - cents, 0) AS cum_before,
       |    CAST(sum(cents) OVER (PARTITION BY g) AS BIGINT) AS total
       |  FROM totals
       |), abc_classed AS (
       |  SELECT g, cents, total,
       |    CASE WHEN cum_before * 100 < total * $cutA THEN 'A'
       |         WHEN cum_before * 100 < total * $cutB THEN 'B'
       |         ELSE 'C' END AS abc_class
       |  FROM abc_ranked
       |), abc_out AS (
       |  SELECT g, abc_class, CAST(count(*) AS BIGINT) AS n_entities,
       |    CAST(sum(cents) AS BIGINT) AS cents,
       |    CASE WHEN any_value(total) > 0 THEN
       |      round(CAST(sum(cents) AS DOUBLE)
       |        / CAST(any_value(total) AS DOUBLE), 9) END AS share
       |  FROM abc_classed GROUP BY g, abc_class
       |)""".stripMargin
}

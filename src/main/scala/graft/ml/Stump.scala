package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single-feature decision stump sweep — the "is there one cheap
  * threshold rule that separates good rows from bad" probe a corpus
  * engineer runs before spending on a learned classifier (Holte's
  * 1R, and the exact shape of every hand-tuned Gopher/C4 quality
  * rule: keep iff feature ≤ τ). Evaluates a FIXED candidate
  * threshold grid and ranks each cut by Youden's J = |TPR − FPR|.
  *
  * Exactness: per-threshold confusion cells are exact BIGINT counts;
  * the selection statistic is the cross-multiplied integer
  * j_num = |pos_le·N − neg_le·P| (denominator P·N is threshold-
  * independent, so integer argmax over j_num IS argmax over J);
  * the reported j is one closing division rounded to 9 dp. Winner
  * tie-break: smallest threshold.
  *
  * Scale shape: rows collapse to (feature value → pos/neg counts)
  * first, then each of the k thresholds is a conditional sum over
  * that compressed table — one partial-aggregable pass, k-bounded
  * output, no per-row cross join with the grid.
  */
object Stump {

  /** Sweep `thresholds` over integer `featureCol` against binary
    * `labelCol`. Returns one row per threshold:
    * (threshold, n_le, pos_le, j, best). */
  def sweep(
      df: DataFrame,
      featureCol: String,
      labelCol: String,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted,
      "thresholds must be a non-empty ascending grid")
    val byVal = df.groupBy(col(featureCol).as("x"))
      .agg(count(lit(1)).as("n_eq"),
        sum(col(labelCol).cast("long")).as("pos_eq"))
    val cells = byVal.agg(
      sum(col("n_eq")).as("n"), sum(col("pos_eq")).as("p") +: thresholds
        .flatMap { t =>
          Seq(sum(when(col("x") <= t, col("n_eq")).otherwise(0L))
              .as(s"n_le_$t"),
            sum(when(col("x") <= t, col("pos_eq")).otherwise(0L))
              .as(s"p_le_$t"))
        }: _*)
    // ONE aggregation, exploded to grid rows through a literal struct
    // array — a union of per-threshold selects would re-execute the
    // aggregate (and rescan the data) once per threshold
    val perThr = cells.select(col("n"), col("p"),
        explode(array(thresholds.map(t => struct(lit(t).as("threshold"),
          col(s"n_le_$t").as("n_le"), col(s"p_le_$t").as("pos_le"))): _*))
          .as("thr"))
      .select(col("thr.threshold").as("threshold"),
        col("thr.n_le").as("n_le"), col("thr.pos_le").as("pos_le"),
        col("n"), col("p"))
    val jNum = abs(col("pos_le") * (col("n") - col("p")) -
      (col("n_le") - col("pos_le")) * col("p"))
    val wAll = Window.partitionBy()
    perThr
      .withColumn("j_num", jNum)
      .withColumn("j_max", max(col("j_num")).over(wAll))
      .withColumn("t_best",
        min(when(col("j_num") === col("j_max"), col("threshold")))
          .over(wAll))
      .select(col("threshold"), col("n_le"), col("pos_le"),
        round(col("j_num").cast("double") /
          (col("p") * (col("n") - col("p"))).cast("double"), 9).as("j"),
        (col("threshold") === col("t_best")).as("best"))
      .orderBy("threshold")
  }

  /** DuckDB restatement of [[sweep]] over `rel(x, label01)`; ends in
    * `stump_out(threshold, n_le, pos_le, j, best)`. */
  def sweepSql(rel: String, thresholds: Seq[Long]): String = {
    val thrValues = thresholds.map(t => s"($t)").mkString(", ")
    s"""tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(label01) AS BIGINT) AS p
       |  FROM $rel
       |), grid AS (SELECT * FROM (VALUES $thrValues) g(threshold)),
       |cells AS (
       |  SELECT g.threshold,
       |    CAST(count(*) FILTER (WHERE r.x <= g.threshold) AS BIGINT)
       |      AS n_le,
       |    CAST(COALESCE(sum(r.label01)
       |      FILTER (WHERE r.x <= g.threshold), 0) AS BIGINT) AS pos_le
       |  FROM grid g CROSS JOIN $rel r GROUP BY g.threshold
       |), j AS (
       |  SELECT c.threshold, c.n_le, c.pos_le, t.n, t.p,
       |    abs(c.pos_le * (t.n - t.p) - (c.n_le - c.pos_le) * t.p)
       |      AS j_num
       |  FROM cells c CROSS JOIN tot t
       |), pick AS (
       |  SELECT min(threshold) AS t_best FROM j
       |  WHERE j_num = (SELECT max(j_num) FROM j)
       |), stump_out AS (
       |  SELECT threshold, n_le, pos_le,
       |    round(CAST(j_num AS DOUBLE)
       |      / CAST(p * (n - p) AS DOUBLE), 9) AS j,
       |    threshold = t_best AS best
       |  FROM j CROSS JOIN pick
       |)""".stripMargin
  }
}

package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mode imputation — the constraint-repair member of the cleaning
  * family (q133 repairs encodings, q177 clamps tails, this fills
  * HOLES): nulls in an attribute take the most frequent non-null
  * value among rows sharing a group key, the classic categorical
  * repair before a model or a NOT NULL contract (q12) would reject
  * the rows.
  *
  * Determinism: the mode is elected by (count DESC, value ASC) — the
  * same tie discipline as q196's label election — so the imputed
  * value never depends on scan order. Groups whose non-null support
  * is EMPTY stay null (reported, not silently filled); the report
  * carries the mode's share of non-null rows so callers can gate on
  * confidence (a 20%-share mode is a guess, not a repair).
  *
  * Scale shape: the election is one partial-aggregated
  * (group, value) census + a window over the groups-sized census
  * (never the rows); the fill is a broadcast join of the
  * groups-sized mode table back onto the corpus.
  */
object Impute {

  /** Fill plan + census per group.
    * @return (group_key, n_rows, n_null, mode_value, mode_share) —
    *   mode_value/share null when a group has no non-null support.
    */
  def modeReport(df: DataFrame, groupCol: String,
      attrCol: String): DataFrame = {
    val census = df.filter(col(attrCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(attrCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val byG = Window.partitionBy("g")
    val modes = census
      .withColumn("rn", row_number().over(
        byG.orderBy(col("c").desc, col("v"))))
      .withColumn("nn", sum(col("c")).over(byG))
      .filter(col("rn") === 1)
      .select(col("g"), col("v").as("mode_value"),
        round(col("c").cast("double") / col("nn"), 6).as("mode_share"))
    df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col(attrCol).isNull, 1)).as("n_null"))
      .join(broadcast(modes), Seq("g"), "left")
      .select(col("g").as("group_key"), col("n_rows"), col("n_null"),
        col("mode_value"), col("mode_share"))
  }

  /** Apply the fill: nulls take their group's mode (groups without
    * support stay null); adds `was_imputed`.
    */
  def modeFill(df: DataFrame, groupCol: String,
      attrCol: String): DataFrame = {
    val modes = modeReport(df, groupCol, attrCol)
      .select(col("group_key"), col("mode_value"))
    df.join(broadcast(modes), df(groupCol) === col("group_key"), "left")
      .withColumn("was_imputed",
        col(attrCol).isNull && col("mode_value").isNotNull)
      .withColumn(attrCol, coalesce(col(attrCol), col("mode_value")))
      .drop("group_key", "mode_value")
  }
}

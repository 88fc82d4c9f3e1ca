package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level change-data capture between two versions of a keyed
  * table — the lakehouse "table_changes() / CDF" read and the dbt
  * snapshot's upstream question ("what changed since the last
  * run?") answered directly: given `before` and `after`, emit one
  * row per inserted / updated / deleted key.
  *
  * Plan shape: ONE full-outer hash join on the unique key; the
  * change classification is a codegen'd null-safe struct compare.
  * At 100 TB both sides shuffle once on the key (or zero times if
  * both are bucketed on it — the join then co-locates, see
  * sources/Bucketing.scala), and the dominant unchanged mass is
  * dropped by the post-join filter map-side, so the output stream
  * is proportional to the CHANGES, not the table.
  */
object Cdc {

  val ChangeCol = "change"

  /** Diff `after` vs `before` on `uniqueKey`, comparing
    * `compareCols` (null-safe). Returns uniqueKey columns +
    * `change` ∈ {insert, update, delete} + `compareCols` as
    * before_/after_ pairs — updates carry both sides, inserts only
    * after_, deletes only before_.
    */
  def diff(
      before: DataFrame,
      after: DataFrame,
      uniqueKey: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(uniqueKey.nonEmpty, "uniqueKey must be non-empty")
    val b = before.select((uniqueKey ++ compareCols).map(col): _*)
      .withColumn("_b", lit(1))
    val a = after.select((uniqueKey ++ compareCols).map(col): _*)
      .withColumn("_a", lit(1))
    val joined = b.as("b").join(a.as("a"),
      uniqueKey.map(k => col(s"b.$k") <=> col(s"a.$k")).reduce(_ && _),
      "full_outer")
    val bs = struct(compareCols.map(c => col(s"b.$c")): _*)
    val as_ = struct(compareCols.map(c => col(s"a.$c")): _*)
    val change = when(col("b._b").isNull, "insert")
      .when(col("a._a").isNull, "delete")
      .when(!(bs <=> as_), "update")
    joined
      .withColumn(ChangeCol, change)
      .filter(col(ChangeCol).isNotNull)
      .select(
        uniqueKey.map(k => coalesce(col(s"a.$k"), col(s"b.$k")).as(k)) ++
          Seq(col(ChangeCol)) ++
          compareCols.map(c => col(s"b.$c").as(s"before_$c")) ++
          compareCols.map(c => col(s"a.$c").as(s"after_$c")): _*)
  }
}

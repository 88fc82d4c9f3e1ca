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

  /** Column-level attribution over a [[diff]] result: of the UPDATE
    * rows, how many touched each compared column — the "what is
    * actually churning" audit that decides SCD2 check_cols (q11),
    * incremental merge keys, and whether a noisy column should be
    * excluded from change detection. One pass of conditional sums
    * over the (changes-sized) diff output, melted to a row per
    * column (q172's expand idiom).
    */
  def columnCensus(diffed: DataFrame, compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val upd = diffed.filter(col(ChangeCol) === "update")
    val aggs = compareCols.map(c =>
      sum(when(!(col(s"before_$c") <=> col(s"after_$c")), 1L)
        .otherwise(0L)).as(s"chg_$c"))
    upd.agg(count(lit(1)).as("n_updates"), aggs: _*)
      .select(col("n_updates"),
        explode(array(compareCols.map(c =>
          struct(lit(c).as("column_name"),
            col(s"chg_$c").as("n_changed"))): _*)).as("s"))
      .select(col("s.column_name").as("column_name"),
        col("s.n_changed").as("n_changed"), col("n_updates"),
        round(col("s.n_changed").cast("double") / col("n_updates"), 6)
          .as("share_of_updates"))
  }
}

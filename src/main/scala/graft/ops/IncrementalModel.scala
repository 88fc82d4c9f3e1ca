package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt-style incremental materialization — the reference writes
  * incremental models with `unique_key`, `strategy`, `updated_at`,
  * `on_schema_change` (datanika `services/dbt_project.py:171-175`).
  *
  * Strategies map to pure relational expressions (one PK shuffle):
  *  - append: union all
  *  - merge / delete+insert: rows matching batch keys are replaced
  *    (identical result for whole-row models; dbt differs only in
  *    column-subset updates, which file-based tables rewrite anyway)
  */
object IncrementalModel {
  sealed trait Strategy
  case object Append extends Strategy
  case object Merge extends Strategy
  case object DeleteInsert extends Strategy

  sealed trait OnSchemaChange
  case object Ignore extends OnSchemaChange
  case object Fail extends OnSchemaChange
  case object AppendNewColumns extends OnSchemaChange
  case object SyncAllColumns extends OnSchemaChange

  final class SchemaChanged(msg: String) extends RuntimeException(msg)

  def run(
      existing: DataFrame,
      batch: DataFrame,
      uniqueKey: Seq[String],
      strategy: Strategy = Merge,
      onSchemaChange: OnSchemaChange = Ignore): DataFrame = {
    val (e, b) = reconcile(existing, batch, onSchemaChange)
    strategy match {
      case Append => e.unionByName(b)
      case Merge | DeleteInsert => Writer.merge(e, b, uniqueKey)
    }
  }

  /** `is_incremental()` filter: only batch rows newer than the
    * existing high-water mark take part. The max() is a single-column
    * partial aggregate; the resulting literal bound is pushed into
    * the batch scan.
    */
  def isIncrementalFilter(existing: DataFrame, batch: DataFrame, updatedAt: String): DataFrame = {
    val row = existing.agg(max(col(updatedAt))).head()
    if (row.isNullAt(0)) batch else batch.filter(col(updatedAt) > lit(row.get(0)))
  }

  private def reconcile(
      existing: DataFrame,
      batch: DataFrame,
      mode: OnSchemaChange): (DataFrame, DataFrame) = {
    val eCols = existing.columns.toSeq
    val bCols = batch.columns.toSeq
    val newCols = bCols.filterNot(eCols.contains)
    val droppedCols = eCols.filterNot(bCols.contains)
    if (newCols.isEmpty && droppedCols.isEmpty) return (existing, batch)
    mode match {
      case Ignore =>
        // dbt ignore: keep the existing relation's shape
        (existing, batch.select(eCols.filter(bCols.contains).map(col): _*)
          .unionByName(existing.limit(0), allowMissingColumns = true))
      case Fail =>
        throw new SchemaChanged(
          s"schema changed: new=${newCols.mkString(",")} dropped=${droppedCols.mkString(",")}")
      case AppendNewColumns =>
        (existing.unionByName(batch.limit(0), allowMissingColumns = true),
          batch.unionByName(existing.limit(0), allowMissingColumns = true))
      case SyncAllColumns =>
        // target takes the batch's shape: add new, drop removed
        val synced = existing.select(eCols.filter(bCols.contains).map(col): _*)
          .unionByName(batch.limit(0), allowMissingColumns = true)
        (synced, batch)
    }
  }
}

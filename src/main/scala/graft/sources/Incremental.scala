package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cursor-based incremental extraction — the reference's
  * `dlt.sources.incremental(cursor_path, initial_value, row_order)`
  * used by single_table mode (datanika `services/dlt_runner.py:169-181`,
  * validation in `services/upload_service.py:156-173`).
  *
  * Re-expressed as a predicate on the cursor column so the bound is
  * PUSHED INTO THE SCAN (parquet row-group skipping / partition
  * pruning at scale) — the engine never reads rows at or below the
  * watermark, which is what makes incremental ingestion O(new data)
  * instead of O(table) on a 100 TB table partitioned by the cursor.
  */
object Incremental {
  final case class State(lastValue: Option[Any])

  /** Rows strictly above the watermark (dlt's open interval on
    * re-runs), ordered by the cursor if `row_order` was requested.
    */
  def extract(
      df: DataFrame,
      cursorPath: String,
      initialValue: Option[Any] = None,
      rowOrder: Option[String] = None): DataFrame = {
    val cur: Column = col(cursorPath)
    val bounded = initialValue match {
      case Some(v) => df.filter(cur > lit(v))
      case None    => df.filter(cur.isNotNull)
    }
    rowOrder match {
      case Some("asc")  => bounded.sortWithinPartitions(cur.asc)
      case Some("desc") => bounded.sortWithinPartitions(cur.desc)
      case Some(other)  => throw new IllegalArgumentException(s"row_order must be asc|desc, got $other")
      case None         => bounded
    }
  }

  /** New watermark after a batch: max(cursor). Single-column agg —
    * one partial-aggregate pass, no collect of data rows.
    */
  def nextState(df: DataFrame, cursorPath: String): State = {
    val row = df.agg(max(col(cursorPath))).head()
    State(if (row.isNullAt(0)) None else Some(row.get(0)))
  }
}

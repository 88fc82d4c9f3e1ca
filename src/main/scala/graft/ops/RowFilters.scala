package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level quality filters — the reference's 8 filter operators
  * (datanika `services/dlt_runner.py:46-55` FILTER_OPS, validated in
  * `services/upload_service.py:19`).
  *
  * Reference semantics are Python-row based; re-expressed as Catalyst
  * `Column` predicates so they compile into the scan (parquet
  * `PushedFilters`) instead of running per-row code. Null semantics
  * match the reference exactly:
  *   - eq:  `row[c] == v`      → null-safe equal (null == v is false)
  *   - ne:  `row[c] != v`      → NOT null-safe-equal (null != v is TRUE)
  *   - gt/gte/lt/lte: reference guards `is not None` → plain SQL
  *     comparison (NULL compares to NULL → filtered) is identical
  *   - in:  `row[c] in vals`   → isin (null → false), identical
  *   - not_in: `row[c] not in vals` → null yields TRUE in Python, so
  *     the predicate is `isnull(c) OR NOT isin`.
  */
object RowFilters {
  sealed trait Op
  case object Eq extends Op
  case object Ne extends Op
  case object Gt extends Op
  case object Gte extends Op
  case object Lt extends Op
  case object Lte extends Op
  case object In extends Op
  case object NotIn extends Op

  object Op {
    def parse(s: String): Op = s match {
      case "eq" => Eq; case "ne" => Ne; case "gt" => Gt; case "gte" => Gte
      case "lt" => Lt; case "lte" => Lte; case "in" => In; case "not_in" => NotIn
      case other => throw new IllegalArgumentException(s"Unknown filter op: $other")
    }
  }

  final case class RowFilter(column: String, op: Op, value: Any)

  def predicate(f: RowFilter): Column = {
    val c = col(f.column)
    def values: Seq[Any] = f.value match {
      case s: Seq[_] => s
      case other => Seq(other)
    }
    f.op match {
      case Eq    => c <=> lit(f.value)
      case Ne    => !(c <=> lit(f.value))
      case Gt    => c > lit(f.value)
      case Gte   => c >= lit(f.value)
      case Lt    => c < lit(f.value)
      case Lte   => c <= lit(f.value)
      case In    => c.isin(values: _*)
      case NotIn => c.isNull || !c.isin(values: _*)
    }
  }

  /** AND-combine a filter list, as the reference chains add_filter. */
  def apply(df: DataFrame, filters: Seq[RowFilter]): DataFrame =
    if (filters.isEmpty) df
    else df.filter(filters.map(predicate).reduce(_ && _))
}

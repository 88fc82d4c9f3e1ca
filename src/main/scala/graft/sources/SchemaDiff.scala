package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema drift DIFF — the report between q16's introspection (what
  * IS the schema) and q07/q08's contracts (what to DO about drift):
  * given two schema versions, one row per changed column with the
  * change class, the artifact a migration review or an alert
  * actually wants. Classes: added / removed / type_changed /
  * nullability_changed (type wins when both moved — a retyped
  * column's nullability is noise).
  *
  * Schemas are METADATA: the diff builds driver-side from the two
  * StructTypes (bounded by column count, nothing scans) and comes
  * back as a DataFrame so it can join catalogs, land in audit
  * tables, or gate a DAG run like any other frame.
  */
object SchemaDiff {

  /** @return (column_name, before_type, after_type, change) — types
    *   as catalog strings, null on the absent side; unchanged
    *   columns included only when `includeUnchanged`.
    */
  def diff(spark: SparkSession, before: StructType, after: StructType,
      includeUnchanged: Boolean = false): DataFrame = {
    val b = before.fields.map(f => f.name -> f).toMap
    val a = after.fields.map(f => f.name -> f).toMap
    val names = (before.fields.map(_.name) ++
      after.fields.map(_.name)).distinct.sorted
    val rows = names.flatMap { n =>
      (b.get(n), a.get(n)) match {
        case (Some(bf), None) =>
          Some((n, bf.dataType.catalogString, null: String, "removed"))
        case (None, Some(af)) =>
          Some((n, null: String, af.dataType.catalogString, "added"))
        case (Some(bf), Some(af)) =>
          val (bt, at) = (bf.dataType.catalogString, af.dataType.catalogString)
          if (bt != at) Some((n, bt, at, "type_changed"))
          else if (bf.nullable != af.nullable)
            Some((n, bt, at, "nullability_changed"))
          else if (includeUnchanged) Some((n, bt, at, "unchanged"))
          else None
        case (None, None) => None
      }
    }
    import spark.implicits._
    rows.toSeq.toDF("column_name", "before_type", "after_type", "change")
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-width (mainframe/COBOL copybook-style) record layout — the
  * one file shape the ingest family (CSV q15, JSON q187, XML q258,
  * archives q70) still lacked: no delimiters, every field is a
  * byte-offset slice, numerics zero-padded right-aligned, text
  * space-padded left-aligned. Banks, telcos and logistics EDI still
  * emit terabytes of it.
  *
  * Both directions are PURE Catalyst projections (substring / lpad /
  * rpad / trim — codegen'd, zero shuffle, and the reader pushes
  * straight onto a text-file scan): a fixed-width parse is exactly
  * the case where "compose existing expressions" beats any custom
  * code path.
  *
  * Overflow contract: render REQUIRES each value to fit its field
  * (a silently truncated amount is a corrupted ledger) — enforced
  * with a raise on overflow rather than best-effort clipping.
  */
object FixedWidth {

  /** One field of the layout: 1-based `start`, byte `len`,
    * `numeric` = zero-padded right-aligned (else space-padded
    * left-aligned text).
    */
  final case class Field(name: String, start: Int, len: Int,
      numeric: Boolean) {
    require(start >= 1 && len >= 1, s"bad field $name ($start, $len)")
  }

  private def contiguous(fields: Seq[Field]): Unit = {
    val sorted = fields.sortBy(_.start)
    sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
      require(a.start + a.len == b.start,
        s"layout gap/overlap between ${a.name} and ${b.name}")
    }
  }

  /** Render columns into one fixed-width `line` column. */
  def render(df: DataFrame, fields: Seq[Field]): DataFrame = {
    contiguous(fields)
    val parts = fields.sortBy(_.start).map { f =>
      val s = col(f.name).cast("string")
      val guarded = when(length(s) > f.len,
        raise_error(concat(lit(s"FixedWidth.render: ${f.name} overflows " +
          s"${f.len} chars: "), s)))
        .otherwise(s)
      if (f.numeric) lpad(guarded, f.len, "0") else rpad(guarded, f.len, " ")
    }
    df.withColumn("line", concat(parts: _*))
  }

  /** Parse a `lineCol` back into string columns (numeric fields
    * still arrive as zero-padded strings — casting is the caller's
    * schema decision, the CSV-path contract). Short lines yield
    * empty/truncated fields, surfaced by `line_ok`.
    */
  def parse(df: DataFrame, lineCol: String, fields: Seq[Field]): DataFrame = {
    contiguous(fields)
    val total = fields.map(f => f.start + f.len - 1).max
    val withCols = fields.foldLeft(df) { (acc, f) =>
      val raw = substring(col(lineCol), f.start, f.len)
      acc.withColumn(f.name,
        if (f.numeric) raw else rtrim(raw))
    }
    withCols.withColumn("line_ok", length(col(lineCol)) === total)
  }
}

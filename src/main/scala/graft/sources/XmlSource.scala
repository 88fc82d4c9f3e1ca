package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType,
  StringType, StructField, StructType}

/** XML record shredding — the enterprise-ingest format the file
  * family (CSV q15, JSON q187, parquet/ORC q101, archives q70, WARC
  * q138) still lacked: parse each row's XML document with a REAL
  * XML parser (scala-xml over JAXP — entity decoding, attribute
  * quoting, CDATA, nested elements handled by the spec, not by
  * regexes), select the repeated record elements by tag, and
  * project a fixed field list as columns.
  *
  * Security: the parser runs with DTDs DISABLED (no external-entity
  * resolution, no entity-expansion bombs) — the XXE hardening any
  * ingest of untrusted XML requires; a document that needs its DTD
  * to parse counts as malformed.
  *
  * Malformed-input contract: an unparseable document yields ONE row
  * with `malformed = true` and null fields (auditability without a
  * second parse pass); well-formed documents yield one row per
  * record element with `rec_idx` preserving document order.
  *
  * 100 TB shape: parsing is per-row work inside `mapPartitions`
  * (justified — a recursive-descent XML parse is not expressible as
  * a Catalyst expression; same rationale as the q33 media decode
  * and q70 archive walk), no shuffle, output streams partition-
  * local. Field values are strings by contract; casting is the
  * caller's schema decision, as in the CSV path.
  */
object XmlSource {

  /** @param fields child-element names of each record element,
    *   projected in order (first matching child's trimmed text;
    *   null when absent).
    */
  def shred(df: DataFrame, idCol: String, xmlCol: String,
      recordTag: String, fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    val schema = StructType(
      StructField("id", LongType) +:
      StructField("rec_idx", IntegerType) +:
      StructField("malformed", BooleanType) +:
      fields.map(f => StructField(f, StringType)))
    val fieldList = fields.toIndexedSeq // serializable capture
    val tag = recordTag
    val in = df.select(col(idCol).cast("long"), col(xmlCol).cast("string"))
    in.mapPartitions { rows =>
      // one hardened parser per partition: DTDs disallowed (XXE)
      val spf = javax.xml.parsers.SAXParserFactory.newInstance()
      spf.setFeature(
        "http://apache.org/xml/features/disallow-doctype-decl", true)
      spf.setNamespaceAware(false)
      val loader = scala.xml.XML.withSAXParser(spf.newSAXParser())
      rows.flatMap { r =>
        val id = if (r.isNullAt(0)) null else Long.box(r.getLong(0))
        val xml = if (r.isNullAt(1)) null else r.getString(1)
        val parsed =
          try {
            if (xml == null) None else Some(loader.loadString(xml))
          } catch { case scala.util.control.NonFatal(_) => None }
        parsed match {
          case None =>
            Iterator.single(Row.fromSeq(
              id +: null +: Boolean.box(true) +: fieldList.map(_ => null)))
          case Some(root) =>
            (root \\ tag).iterator.zipWithIndex.map { case (rec, i) =>
              val vals = fieldList.map { f =>
                val c = rec \ f
                if (c.isEmpty) null else c.head.text.trim
              }
              Row.fromSeq(id +: Int.box(i) +: Boolean.box(false) +: vals)
            }
        }
      }
    }(Encoders.row(schema))
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MongoDB source — the Spark re-expression of the reference's
  * pymongo-based dlt source (datanika `services/mongodb_source.py`:
  * connection URI + database + optional collection names; each
  * collection becomes a replace-disposition table, ObjectIds
  * stringified).
  *
  * A wire-protocol client is out of reach here (no driver dependency,
  * zero egress), so the exercisable surface is MongoDB's OWN
  * interchange format: Extended JSON v2 (the `mongoexport` /
  * `mongodump` output, one document per line, per the public BSON
  * spec). Both published modes are supported:
  *
  *  - `canonical`: every BSON type wrapped —
  *    `{"$oid":…}`, `{"$date":{"$numberLong":"ms"}}`,
  *    `{"$numberInt":"5"}`, `{"$numberLong":…}`, `{"$numberDouble":…}`,
  *    `{"$numberDecimal":…}`;
  *  - `relaxed` (mongoexport's default): plain JSON numbers,
  *    `{"$date":"ISO-8601"}`, `$oid`/`$numberDecimal` still wrapped.
  *
  * The unwrap is schema-driven: the caller states the target Spark
  * schema, the envelope schema is derived per mode, and each wrapper
  * collapses via codegen'd struct-field extraction + cast — so a
  * 100 TB dump parses executor-side with no UDFs; the driver never
  * sees a document. ObjectId fields surface as their 24-hex string,
  * exactly the reference's `_convert_object_ids`.
  */
object MongoSource {

  /** Target-schema field types that mark an ObjectId column (the
    * Mongo `_id` convention: a string column listed in `oidFields`).
    */
  final case class MongoConfig(
      mode: String = "relaxed", // mongoexport default
      oidFields: Set[String] = Set("_id"))

  private def canonical(mode: String): Boolean = mode match {
    case "canonical" => true
    case "relaxed" => false
    case other => throw new IllegalArgumentException(
      s"unknown Extended JSON mode: $other (canonical|relaxed)")
  }

  /** Envelope (wire) type of one field, per mode. */
  private def wireType(f: StructField, cfg: MongoConfig): DataType =
    if (cfg.oidFields(f.name)) new StructType().add("$oid", StringType)
    else f.dataType match {
      case TimestampType =>
        if (canonical(cfg.mode))
          new StructType().add("$date", new StructType().add("$numberLong", StringType))
        else new StructType().add("$date", StringType)
      case IntegerType if canonical(cfg.mode) =>
        new StructType().add("$numberInt", StringType)
      case LongType if canonical(cfg.mode) =>
        new StructType().add("$numberLong", StringType)
      case DoubleType if canonical(cfg.mode) =>
        new StructType().add("$numberDouble", StringType)
      case _: DecimalType => // wrapped in BOTH modes
        new StructType().add("$numberDecimal", StringType)
      case other => other // string/bool/plain numbers pass through
    }

  /** Unwrap one envelope column back to its target type. */
  private def unwrap(f: StructField, cfg: MongoConfig): Column = {
    val c = col(f.name)
    val out =
      if (cfg.oidFields(f.name)) c.getField("$oid")
      else f.dataType match {
        case TimestampType =>
          if (canonical(cfg.mode))
            timestamp_millis(
              c.getField("$date").getField("$numberLong").cast(LongType))
          else to_timestamp(c.getField("$date"))
        case IntegerType if canonical(cfg.mode) =>
          c.getField("$numberInt").cast(IntegerType)
        case LongType if canonical(cfg.mode) =>
          c.getField("$numberLong").cast(LongType)
        case DoubleType if canonical(cfg.mode) =>
          c.getField("$numberDouble").cast(DoubleType)
        case d: DecimalType => c.getField("$numberDecimal").cast(d)
        case t => c.cast(t)
      }
    out.as(f.name)
  }

  /** One collection dump (NDJSON of Extended JSON documents) →
    * typed DataFrame. `path` may be a file, directory, or glob —
    * Spark's FileIndex lists it in parallel.
    */
  def readCollection(spark: SparkSession, path: String, schema: StructType,
      cfg: MongoConfig = MongoConfig()): DataFrame = {
    val envelope = StructType(schema.fields.map(f =>
      StructField(f.name, wireType(f, cfg), nullable = true)))
    spark.read.schema(envelope).json(path)
      .select(schema.fields.map(f => unwrap(f, cfg)).toSeq: _*)
  }

  /** Database surface matching the reference source: a directory of
    * `{collection}.json` dumps; `collectionNames=None` ⇒ discover all
    * (the `list_collection_names()` path).
    */
  def read(spark: SparkSession, dir: String,
      schemas: Map[String, StructType],
      collectionNames: Option[Seq[String]] = None,
      cfg: MongoConfig = MongoConfig()): Map[String, DataFrame] = {
    val names = collectionNames.getOrElse {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).map(_.getPath.getName)
        .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).toSeq.sorted
    }
    names.map { n =>
      val schema = schemas.getOrElse(n, throw new IllegalArgumentException(
        s"no schema for collection $n (schemas are required: inference " +
          "double-reads the dump)"))
      n -> readCollection(spark, s"$dir/$n.json", schema, cfg)
    }.toMap
  }
}

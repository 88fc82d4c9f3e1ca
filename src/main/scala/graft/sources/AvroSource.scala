package graft.sources

import scala.collection.JavaConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File ingest — the remaining mainstream
  * row-format next to csv/json/parquet/orc (FileSource) and the
  * fixed/XML/WARC specials; Kafka archive dumps and many CDC feeds
  * land as .avro containers. Built on the avro-core library that
  * ships on Spark's classpath (the `spark-avro` DataSource module is
  * NOT bundled here, so the container is parsed directly with the
  * public Avro reader API).
  *
  * Scale shape: files list through the binaryFile source (one row
  * per container, Spark distributes files across tasks), and each
  * container decodes inside its task via mapPartitions — the Avro
  * container is the parallelism unit, exactly how a path-listing
  * DataSource would split non-splittable codecs. Supported field
  * types: long/int, double/float, string, boolean, and their
  * ["null", T] unions (null-safe).
  */
object AvroSource {

  /** Read every `*.avro` container under `dir` into `schema`
    * (column names must match Avro field names). */
  def read(spark: SparkSession, dir: String, schema: StructType)
      : DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(dir)
      .select("content")
    val enc = Encoders.row(schema)
    val names = schema.fields.map(_.name)
    val types = schema.fields.map(_.dataType)
    files.mapPartitions { it =>
      it.flatMap { fileRow =>
        val bytes = fileRow.getAs[Array[Byte]]("content")
        val reader = DataFileReader.openReader(
          new SeekableByteArrayInput(bytes),
          new GenericDatumReader[GenericRecord]())
        try {
          val out = Iterator.continually(reader)
            .takeWhile(_.hasNext).map(_.next()).map { rec =>
              Row.fromSeq(names.zip(types).map { case (n, t) =>
                convert(rec.get(n), t)
              })
            }.toVector // materialize before the reader closes
          out
        } finally reader.close()
      }
    }(enc)
  }

  private def convert(v: AnyRef, t: DataType): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case other => (other, t) match {
      case (x: java.lang.Long, LongType) => x.longValue()
      case (x: java.lang.Integer, LongType) => x.longValue()
      case (x: java.lang.Double, DoubleType) => x.doubleValue()
      case (x: java.lang.Float, DoubleType) => x.doubleValue()
      case (x: java.lang.Boolean, BooleanType) => x.booleanValue()
      case (x: CharSequence, StringType) => x.toString
      case (x, dt) => throw new IllegalArgumentException(
        s"unsupported avro value ${x.getClass} for $dt")
    }
  }

  /** Fixture/export utility: write `rows` (field order = schema
    * order) as ONE local Avro container. Driver-side by design —
    * it exists to build test fixtures and small dimension exports;
    * the scalable path is the distributed [[read]]. */
  def writeLocal(
      path: String,
      schemaJson: String,
      rows: Iterator[Seq[Any]]): Unit = {
    val schema = new Schema.Parser().parse(schemaJson)
    val fields = schema.getFields.asScala.map(_.name).toSeq
    val writer = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](schema))
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    writer.create(schema, f)
    try rows.foreach { vals =>
      val rec = new GenericData.Record(schema)
      fields.zip(vals).foreach { case (n, v) => rec.put(n, v) }
      writer.append(rec)
    } finally writer.close()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File ingestion — the reference's file connectors (CSV / JSON /
  * Parquet with glob patterns, datanika `services/dlt_runner.py:10-12,
  * 191-206`; allowed upload types in `services/file_upload_service.py:15`).
  *
  * Globs resolve on the distributed filesystem (Spark's FileIndex),
  * so a bucket with millions of files lists in parallel; explicit
  * schemas avoid the double-read of inference on big inputs.
  */
object FileSource {
  val SupportedTypes: Set[String] = Set("csv", "json", "parquet")

  def read(
      spark: SparkSession,
      format: String,
      path: String,
      glob: Option[String] = None,
      schema: Option[StructType] = None): DataFrame = {
    require(SupportedTypes.contains(format), s"Unsupported file type: $format")
    val full = glob.map(g => s"$path/$g").getOrElse(path)
    var r = spark.read.format(format)
    schema.foreach(sc => r = r.schema(sc))
    format match {
      case "csv" =>
        r = r.option("header", "true")
        if (schema.isEmpty) r = r.option("inferSchema", "true")
      case "json" => // schema strongly recommended: inference scans twice
      case _ =>
    }
    r.load(full)
  }

  /** Reference naming: collapse whitespace to `_`, lowercase
    * (datanika `services/naming.py:to_snake_case`), applied to column
    * names on ingestion.
    */
  def toSnakeCase(name: String): String =
    name.trim.replaceAll("\\s+", "_").toLowerCase

  def normalizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(toSnakeCase): _*)
}

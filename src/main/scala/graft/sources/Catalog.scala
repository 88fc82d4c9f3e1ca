package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, IntegerType, StringType, StructField, StructType}

/** Data catalog introspection — the reference's CatalogService
  * (`services/catalog_service.py:14-48` walks schemas/tables/columns
  * of a destination and upserts catalog entries).
  *
  * Schema metadata comes from the parquet footers (no data scan);
  * row counts come from file metadata via `count()` on an unprojected
  * scan, which Spark answers from footer statistics.
  */
object Catalog {
  private val schema = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("ordinal", IntegerType, nullable = false),
    StructField("data_type", StringType, nullable = false),
    StructField("nullable", StringType, nullable = false),
    StructField("table_rows", LongType, nullable = false)))

  /** Discover table names in a dataset dir (reference semantics:
    * `table_names=None` ⇒ enumerate, always dropping `_dlt_*` system
    * tables — catalog_service.py:25-33).
    */
  def discoverTables(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .filterNot(_.startsWith("_dlt_"))
      .sorted
  }

  def introspect(spark: SparkSession, dir: String, tables: Seq[String]): DataFrame = {
    // Per-table row counts are independent Spark jobs — submit them
    // concurrently from the driver (Spark's scheduler interleaves
    // them) instead of a sequential loop; a 10k-table lake then runs
    // at scheduler throughput, not sum-of-latencies. Each count() is
    // answered from parquet footer statistics, not a data scan.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val rows = Await.result(
      Future.sequence(tables.sorted.map { t =>
        Future {
          val df = Tables.load(spark, dir, t)
          val n = df.count()
          df.schema.fields.zipWithIndex.map { case (f, i) =>
            Row(t, f.name, i, f.dataType.simpleString, f.nullable.toString, n)
          }.toSeq
        }
      }), Duration.Inf).flatten
    val jrows = new java.util.ArrayList[Row]()
    rows.foreach(jrows.add)
    spark.createDataFrame(jrows, schema)
  }
}

package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Live SQL-database extraction over Spark's built-in JDBC reader —
  * the reference's DEFAULT source branch: `sql_table()` for
  * single-table mode and `sql_database()` for full-database mode
  * (datanika `services/dlt_runner.py:167-189`), which graft's
  * parquet-dir `Database` only emulated until now.
  *
  * Scale shape:
  *  - Cursor bounds and row filters are plain Catalyst predicates on
  *    the JDBC relation, so Spark compiles them into the remote
  *    query's WHERE clause (`PushedFilters` on the scan) — the
  *    database ships only rows above the watermark, the classic
  *    O(new data) incremental read.
  *  - Column pruning likewise reaches the remote SELECT list.
  *  - A partitioned read (`partitionColumn`/`numPartitions`) splits
  *    the table into stride ranges fetched by parallel executors —
  *    the only way a 1000-executor cluster ingests a big table
  *    without serializing through one connection.
  *
  * The test fixture is embedded Apache Derby (in `/opt/spark/jars`,
  * zero-egress, same-JVM): real JDBC dialect/driver traffic, no
  * network. Nothing here is Derby-specific — the url decides.
  */
object JdbcSource {

  /** Per-table extraction config, mirroring `Database.TableConfig`
    * plus the JDBC parallel-read knobs.
    */
  final case class TableConfig(
      cursor: Option[String] = None,
      initialValue: Option[Any] = None,
      lastValue: Option[Any] = None,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 1)

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** One table as a lazy DataFrame. With a `partitionColumn` the read
    * fans out into `numPartitions` range-strided remote queries.
    */
  def table(
      spark: SparkSession,
      url: String,
      name: String,
      cfg: TableConfig = TableConfig(),
      options: Map[String, String] = Map.empty): DataFrame =
    (cfg.partitionColumn, cfg.lowerBound, cfg.upperBound) match {
      case (Some(pc), Some(lo), Some(hi)) =>
        spark.read.jdbc(url, name, pc, lo, hi, cfg.numPartitions, props(options))
      case _ =>
        spark.read.jdbc(url, name, props(options))
    }

  /** Single-table incremental extract (`sql_table()` + cursor): the
    * watermark predicate lands in the remote WHERE clause.
    */
  def tableIncremental(
      spark: SparkSession,
      url: String,
      name: String,
      cfg: TableConfig,
      options: Map[String, String] = Map.empty): DataFrame = {
    val base = table(spark, url, name, cfg, options)
    cfg.cursor match {
      case Some(c) => Incremental.extract(base, c, cfg.initialValue, cfg.lastValue)
      case None => base
    }
  }

  /** Full-database extract (`sql_database()`): every selected table
    * as an independent lazy frame with its own cursor/parallelism.
    */
  def database(
      spark: SparkSession,
      url: String,
      tableNames: Seq[String],
      perTable: Map[String, TableConfig] = Map.empty,
      options: Map[String, String] = Map.empty): Map[String, DataFrame] =
    tableNames.map { name =>
      name -> tableIncremental(spark, url, name,
        perTable.getOrElse(name, TableConfig()), options)
    }.toMap

  /** Idempotently load a frame into a JDBC table (fixture setup and
    * the reverse-ETL direction). Single connection: embedded engines
    * serialize writers anyway, and fixtures are small by contract.
    */
  def writeTable(df: DataFrame, url: String, name: String): Unit =
    df.coalesce(1).write.mode("overwrite").jdbc(url, name, new Properties())

  /** True when `name` exists in the database — used to pay fixture
    * load once per warehouse, like `Bucketing.ensureBucketed`.
    */
  def tableExists(url: String, name: String): Boolean = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, name.toUpperCase, null)
      try rs.next() finally rs.close()
    } finally conn.close()
  }
}

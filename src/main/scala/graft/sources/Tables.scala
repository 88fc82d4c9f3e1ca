package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical table loader for the graft engine.
  *
  * Mirrors the reference's source-registration path (datanika
  * `services/dlt_runner.py:149-206` builds dlt sources per table); in
  * Spark the equivalent is a parquet scan per table, registered as a
  * temp view so SQL transforms (the reference's dbt layer) can refer
  * to tables by name.
  *
  * Scale note: `spark.read.parquet` keeps scans declarative so
  * Catalyst applies column pruning + predicate pushdown; at 100 TB
  * each table is a partitioned directory and nothing here changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The events table carries TIMESTAMP(NANOS) which Spark 4 refuses
    * by default; read it as an epoch-nanos long (lossless) and let
    * operators quantize to ms (`NS_PER_MS`) where the semantics call
    * for wall-clock time.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  val NS_PER_MS = 1000000L

  /** Epoch-nanos for a UTC instant like "2024-01-20T00:00:00Z". */
  def epochNs(instant: String): Long =
    java.time.Instant.parse(instant).toEpochMilli * NS_PER_MS

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

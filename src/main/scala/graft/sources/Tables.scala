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

  /** The events table's `ts` contract inside graft is EPOCH-NANOS
    * LONG — operators quantize to ms (`NS_PER_MS`) where the
    * semantics call for wall-clock time. Data generations have
    * shipped it physically as TIMESTAMP(NANOS) (read losslessly as
    * long via the legacy conf) and as timestamp[us] (read as a
    * timestamp type, converted to epoch-ns here — ×1000 exact);
    * normalizing at the loader keeps every operator and every DuckDB
    * oracle (`epoch_ns(ts)`) encoding-agnostic.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTsNs(df) else df
  }

  /** ts → epoch-ns long, whatever the physical encoding. The NTZ →
    * TIMESTAMP cast is value-preserving under the UTC session tz all
    * graft entry points set.
    */
  private[graft] def normalizeTsNs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampType) |
           Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts").cast("timestamp")) * NS_PER_US)
      case _ => df
    }

  val NS_PER_US = 1000L

  val NS_PER_MS = 1000000L

  /** Epoch-nanos for a UTC instant like "2024-01-20T00:00:00Z". */
  def epochNs(instant: String): Long =
    java.time.Instant.parse(instant).toEpochMilli * NS_PER_MS

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

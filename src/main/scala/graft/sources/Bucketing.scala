package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical layout controls for 100 TB tables.
  *
  * - BUCKETING: persisting both sides of a recurring fact⋈fact join
  *   bucketed on the join key lets Spark plan the join with NO
  *   exchange — each task zips bucket i with bucket i. At 100 TB the
  *   shuffle this avoids IS the query cost; bucketing pays it once at
  *   write time.
  * - CLUSTERING: range-repartition + in-partition sort on a filter
  *   column tightens parquet row-group min/max stats so pushed-down
  *   predicates actually skip row groups (a scan for one day of a
  *   clustered cursor column reads ~1 file, not all of them).
  */
object Bucketing {

  /** Persist as a bucketed (+ optionally sorted) catalog table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketing requires columns")
    var w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** Idempotent bucketed materialization: if the table is already
    * registered, reuse it; if its files exist from a previous session
    * (the default session catalog is in-memory, so metadata dies with
    * the JVM while the warehouse files survive), re-register them as
    * an external bucketed table; otherwise write. This is how the
    * write-once-join-many economics of bucketing actually land: only
    * the FIRST run pays the shuffle.
    *
    * Only valid when `df` is deterministic for a given table name
    * (immutable sources) — callers that mutate inputs must drop the
    * table first.
    */
  def ensureBucketed(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    if (spark.catalog.tableExists(table)) return
    val wh = new org.apache.hadoop.fs.Path(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // _SUCCESS gates completeness: a crashed prior write leaves part-
    // files but no commit marker, and must be rewritten, not served
    val hasData = fs.exists(loc) &&
      fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS")) &&
      fs.listStatus(loc).exists(_.getPath.getName.startsWith("part-"))
    if (hasData) {
      val cols = df.schema.fields
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      val sorted =
        if (sortCols.nonEmpty) s"SORTED BY (${sortCols.mkString(", ")})" else ""
      spark.sql(
        s"""CREATE TABLE $table ($cols) USING parquet
           |CLUSTERED BY (${bucketCols.mkString(", ")}) $sorted
           |INTO $numBuckets BUCKETS LOCATION '$loc'""".stripMargin)
    } else writeBucketed(df, table, bucketCols, numBuckets, sortCols)
  }

  /** Write parquet clustered on `clusterCols`: range partitioning
    * puts disjoint value ranges in separate files, the in-partition
    * sort packs row groups tightly — both serve min/max pruning.
    */
  def writeClustered(
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}

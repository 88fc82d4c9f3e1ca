package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Writer

/** Streaming end-to-end: land a stream into a parquet table honoring
  * the dlt write dispositions. foreachBatch gives each micro-batch a
  * batch DataFrame, so the SAME Writer path (append / replace /
  * merge+primary_key with staged swap) serves batch and streaming —
  * the reference's scheduled pipeline runs generalize to a continuous
  * query with exactly-once sink semantics via the checkpoint +
  * idempotent merge.
  */
object StreamSink {

  /** Start a query that applies `disposition` per micro-batch.
    * `merge` makes reprocessed batches idempotent (same PK rows
    * overwrite), which is the correct sink for at-least-once
    * replays; `append` is for immutable event streams.
    */
  def writeWithDisposition(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      disposition: String,
      primaryKey: Seq[String] = Nil): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Writer.write(batch.sparkSession, batch.toDF(), path, disposition, primaryKey)
      }
      .start()

  /** Exactly-once APPEND for at-least-once replays WITHOUT a primary
    * key to merge on (raw event streams): a transaction ledger of
    * committed batch ids makes the append idempotent — the Delta
    * `txn`/`idempotent writes` shape. foreachBatch re-delivers a
    * batch id after a crash-before-checkpoint; `merge` absorbs that
    * only when rows HAVE a PK, while the ledger absorbs it for
    * append-only sinks too.
    *
    * Ledger = one zero-byte marker per committed batch id, created
    * AFTER the append succeeds: a crash between append and marker
    * re-appends that batch (at-least-once inside the sink), so the
    * marker write is the commit point callers must place LAST — the
    * same ordering contract as a real lakehouse commit log. Single
    * writer per query (Structured Streaming's contract), so no
    * marker races.
    *
    * @return true if the batch was applied, false if skipped as a
    *         replay.
    */
  def appendExactlyOnce(
      batch: DataFrame,
      batchId: Long,
      path: String,
      ledgerDir: String): Boolean = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(ledgerDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(ledgerDir, s"batch-$batchId")
    if (fs.exists(marker)) false
    else {
      Writer.write(spark, batch, path, "append")
      fs.mkdirs(new org.apache.hadoop.fs.Path(ledgerDir))
      fs.create(marker, false).close()
      true
    }
  }

  /** Start an exactly-once append stream backed by [[appendExactlyOnce]]. */
  def writeExactlyOnceAppend(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      ledgerDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        appendExactlyOnce(batch.toDF(), id, path, ledgerDir)
        ()
      }
      .start()
}

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
}

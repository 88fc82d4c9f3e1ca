package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-sequence packing — the GPT-style "concatenate the corpus
  * in a canonical order and chop it into fixed `blockSize`-token
  * sequences" step every pretraining data pipeline runs last.
  * Documents may straddle sequence boundaries; the output maps each
  * document to the sequence span it occupies.
  *
  * The core primitive is a GLOBAL exclusive prefix sum of token
  * counts in `orderCol` order — and the 100 TB shape of that is the
  * two-phase scan, not a window:
  * a single `Window.orderBy(orderCol)` (no partitionBy) funnels the
  * entire corpus through ONE reducer, which is exactly the
  * "works on 60k rows, dies on 100 TB" trap. Instead:
  *  1. bucket rows by fixed-width ranges of `orderCol` (bounds from
  *     one cheap min/max agg — deterministic, unlike the sampled
  *     bounds of `repartitionByRange`),
  *  2. one small aggregate computes per-bucket token sums; the
  *     driver prefix-sums the ≤`nBuckets` values (scalars, not rows),
  *  3. each bucket's base offset broadcast-joins back, and the
  *     intra-bucket running sum is a window PARTITIONED by bucket —
  *     every partition works in parallel on its own range.
  * Total cost: two passes over (orderCol, tokens) pairs and one
  * window whose partitions are corpus/nBuckets rows each.
  */
object Packing {

  /** (doc → global token offset) in `orderCol` order. Emits the input
    * plus `offset` (exclusive prefix sum of `tokensCol`). Rows with
    * tokens <= 0 are dropped (nothing to pack). `orderCol` must be
    * unique — it IS the canonical corpus order.
    */
  def tokenOffsets(df: DataFrame, orderCol: String, tokensCol: String,
      nBuckets: Int = 256): DataFrame = {
    val rows = df.filter(col(tokensCol) > 0)
    val Array(lo, hi) = rows.agg(min(col(orderCol)).cast("long"),
      max(col(orderCol)).cast("long")).head() match {
      case r if r.isNullAt(0) => Array(0L, 0L)
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val width = math.max((hi - lo) / nBuckets + 1, 1L)
    // a null/non-numeric order key would silently vanish in the
    // _bucket join and shift every later offset — fail loudly instead
    // (raise_error is a per-row expression: no extra validation pass)
    val ord = when(col(orderCol).cast("long").isNotNull,
        col(orderCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"Packing.tokenOffsets: order column $orderCol is null or " +
          "non-numeric for a row; offsets would be corrupted"))))
    val bucketed = rows.withColumn("_bucket",
      ((ord - lit(lo)) / lit(width)).cast("long"))
    // the two-phase scan is the consolidated graft.ops.PrefixSum
    // (VERDICT r13 item 1) — per-bucket sums prefix into broadcast
    // base offsets, intra-bucket running sums stay bucket-partitioned
    PrefixSum.cumBefore(bucketed, Seq.empty, "_bucket",
        bucketDesc = false, Seq(col(orderCol).asc),
        Seq((col(tokensCol).cast("long"), "offset")))
      .drop("_bucket")
  }

  /** Explode each doc into the training sequences it lands in:
    * (seq_id, <orderCol>, n_tokens) where n_tokens is the part of the
    * doc inside that sequence. Every sequence except the last sums to
    * exactly `blockSize` tokens.
    */
  def packSpans(df: DataFrame, orderCol: String, tokensCol: String,
      blockSize: Long, nBuckets: Int = 256): DataFrame = {
    val off = tokenOffsets(df, orderCol, tokensCol, nBuckets)
      .select(col(orderCol), col(tokensCol).cast("long").as("_tok"), col("offset"))
    val first = expr(s"offset div $blockSize")
    val last = expr(s"(offset + _tok - 1) div $blockSize")
    off.withColumn("seq_id", explode(sequence(first, last)))
      .withColumn("n_tokens",
        least(lit(blockSize) * (col("seq_id") + 1), col("offset") + col("_tok"))
          - greatest(lit(blockSize) * col("seq_id"), col("offset")))
      .select(col("seq_id"), col(orderCol), col("n_tokens"))
  }

  /** Per-sequence manifest: how many docs feed each sequence, the
    * token fill, and the doc-id range — the shard index a training
    * loader consumes.
    */
  def sequenceManifest(df: DataFrame, orderCol: String, tokensCol: String,
      blockSize: Long, nBuckets: Int = 256): DataFrame =
    packSpans(df, orderCol, tokensCol, blockSize, nBuckets)
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"))
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test splitting.
  *
  * A per-document random split leaks evaluation data whenever the
  * corpus contains duplicates: two copies of the same document land
  * in different splits and the model is tested on its own training
  * text. (The reference has no training-split surface — this is part
  * of graft's LLM-pipeline tail, alongside dedup/decontamination.)
  * The fix is to assign splits per duplicate CLUSTER, not per row:
  * every member of a cluster inherits the split of the cluster's
  * representative.
  *
  * Scale shape (100 TB): the cluster key is `(xxhash64(text),
  * length(text))` — the same 8-byte-key election `Dedup.exact` uses.
  * The representative (min id) is a window min over that
  * partitioning, and because the semantics annotate EVERY row with
  * its cluster's split, the corpus meets its representative in
  * exactly one hash exchange — and that window exchange ships whole
  * rows, bodies included (unavoidable for annotate-in-place; a
  * project-hashes-then-join-back variant would just move the bodies
  * in the join's shuffle instead). The split assignment itself is a
  * pure projection on the representative id — deterministic,
  * seedless, reproducible from the data alone. Near-dup-safe
  * splitting composes via `byRepresentative`: feed `Dedup.clusters`
  * output in as `repCol` (zero additional exchanges).
  */
object Split {

  /** Adds `split` ∈ {train, val, test} chosen by the duplicate
    * cluster's representative id, so exact copies never straddle a
    * split boundary. `nBuckets`-way hash of the representative:
    * buckets [0, trainHi) → train, [trainHi, valHi) → val,
    * [valHi, nBuckets) → test.
    */
  def byCluster(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 10, trainHi: Int = 8, valHi: Int = 9): DataFrame = {
    require(0 < trainHi && trainHi < valHi && valHi < nBuckets,
      s"need 0 < trainHi < valHi < nBuckets, got $trainHi/$valHi/$nBuckets")
    val byContent = Window.partitionBy(
      xxhash64(col(textCol)), length(col(textCol)))
    val rep = min(col(idCol)).over(byContent)
    docs.withColumn("cluster_rep", rep)
      .withColumn("split", assignSplit(rep, nBuckets, trainHi, valHi))
  }

  /** The assignment itself — split on an already-resolved
    * representative (e.g. a near-dup cluster id from
    * `Dedup.clusters`). Pure projection, zero exchanges.
    */
  def byRepresentative(docs: DataFrame, repCol: String,
      nBuckets: Int = 10, trainHi: Int = 8, valHi: Int = 9): DataFrame =
    docs.withColumn("split",
      assignSplit(col(repCol), nBuckets, trainHi, valHi))

  private def assignSplit(rep: org.apache.spark.sql.Column,
      nBuckets: Int, trainHi: Int, valHi: Int) = {
    val b = pmod(rep, lit(nBuckets.toLong))
    when(b < trainHi, "train").when(b < valHi, "val").otherwise("test")
  }
}

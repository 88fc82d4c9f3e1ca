package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.plans.Plans.barrier

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two strategies, same output shape (query_id, neighbor_id, cos, rk):
  *  - brute force: exact top-k; the QUERY side is broadcast, the
  *    corpus streams — the plan is a broadcast nested-loop whose cost
  *    is |Q|·N but whose shuffle is only the per-partition top-k
  *    (partial window) — right whenever |Q| is small.
  *  - LSH: random-hyperplane sign codes, banded; each query only
  *    scores its bucket-mates. Sub-linear scored pairs, approximate
  *    recall — right when |Q| is large or latency-bound. An IVF
  *    (k-means coarse quantizer) drops in the same shape: replace
  *    codeBands with nearest-centroid ids.
  *
  * At 100 TB the corpus never shuffles in either path: buckets/codes
  * are per-row expressions, and ranking shuffles only candidate
  * (query, neighbor, score) triples.
  */
object Ann {

  /** Exact top-k by cosine. `queries` must be small (it is
    * broadcast); ties break on neighbor id for determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .join(q, col("query_id") =!= col("neighbor_id")) // broadcast NL join
      .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
    rankTopK(scored, k)
  }

  /** LSH top-k: score only corpus rows sharing ≥1 code band with the
    * query. Candidates dedup on (query, neighbor) before ranking.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 16,
      bands: Int = 4,
      dim: Int = 64): DataFrame = {
    val planes = VectorOps.hyperplanes(bits, dim)
    // barrier: the sign code (bits × dim multiply-adds per row) is
    // computed once and the band explode fans out from the
    // materialized sketch
    def banded(df: DataFrame, id: String, v: String): DataFrame =
      barrier(df.select(col(idCol).as(id), col(vecCol).as(v),
          VectorOps.codeBands(
            VectorOps.signCode(col(vecCol), planes), bits, bands).as("bands")))
        .select(col(id), col(v), explode(col("bands")).as("b"))
        .select(col(id), col(v), col("b.band_id"), col("b.band_val"))

    val c = banded(corpus, "neighbor_id", "nv")
    val q = banded(queries, "query_id", "qv")
    val scored = c.join(q, Seq("band_id", "band_val"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qv", "nv")
      .distinct() // a pair may collide in several bands
      .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
    rankTopK(scored, k)
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("rk"))
  }
}

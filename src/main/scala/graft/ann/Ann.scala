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
      .withColumn("cos", graft.functions.VectorColumns.cosine(col("qv"), col("nv")))
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
            graft.functions.VectorColumns.signCode(col(vecCol), planes), bits, bands).as("bands")))
        .select(col(id), col(v), explode(col("bands")).as("b"))
        .select(col(id), col(v), col("b.band_id"), col("b.band_val"))

    val c = banded(corpus, "neighbor_id", "nv")
    val q = banded(queries, "query_id", "qv")
    val scored = c.join(q, Seq("band_id", "band_val"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qv", "nv")
      .distinct() // a pair may collide in several bands
      .withColumn("cos", graft.functions.VectorColumns.cosine(col("qv"), col("nv")))
    rankTopK(scored, k)
  }

  // ----------------------------------------------------------------
  // IVF (inverted-file) ANN: k-means coarse quantizer
  // ----------------------------------------------------------------

  /** Squared L2 distance to a literal centroid — HOF form, used only
    * on the small query side (probe ranking).
    */
  private def sqDist(v: Column, centroid: Seq[Double]): Column =
    aggregate(zip_with(v, typedlit(centroid), (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)

  /** Index (0-based) of the nearest centroid — native fused loop
    * (the corpus-side hot path).
    */
  private def nearestCentroid(v: Column, centroids: Seq[Seq[Double]]): Column =
    graft.functions.VectorColumns.nearestCentroid(v, centroids)

  /** Lloyd's k-means for the coarse quantizer. Centroids are tiny
    * (nLists × dim) so they live on the driver between iterations —
    * the standard IVF training shape: train on a sample, only
    * assignments are distributed. Deterministic: init takes the first
    * nLists rows by id.
    *
    * Training reads a deterministic hash-sample (`sampleTarget` rows,
    * default 64·nLists): the coarse quantizer needs O(100) vectors
    * per list to converge, and at 100 TB `iters` full-corpus scans
    * before indexing even starts would dominate the whole job. When
    * the corpus is already ≤ target the filter is skipped, so
    * small-corpus centroids are bit-identical to full training.
    */
  def trainCentroids(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      iters: Int = 5,
      sampleTarget: Int = -1): Seq[Seq[Double]] = {
    val target = if (sampleTarget > 0) sampleTarget else 64 * nLists
    val train = Sampler.hashSample(vecs, idCol, target)
    var cents: Seq[Seq[Double]] = train.orderBy(col(idCol)).limit(nLists)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    for (_ <- 1 to iters) {
      // mean per (cluster, dimension): explode is C×dim rows per doc
      // pre-aggregated map-side; the collect is nLists×dim scalars
      val assigned = train.select(col(vecCol).as("v"),
        nearestCentroid(col(vecCol), cents).as("cl"))
      val means = assigned
        .select(col("cl"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cl", "pos")
        // decimal sum → exact, so centroids are identical regardless
        // of partial-aggregate merge order (double avg is not)
        .agg((sum(col("x").cast("decimal(28,10)")) / count(lit(1)))
          .cast("double").as("m"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      cents = cents.indices.map { c =>
        byCluster.get(c) match {
          case Some(rows) =>
            rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          case None => cents(c) // empty cluster keeps its centroid
        }
      }
    }
    cents
  }

  /** IVF top-k: corpus rows score only against queries probing their
    * inverted list. `nProbe` lists per query trades recall for cost
    * (nProbe = nLists ⇒ exact). The corpus never shuffles — cluster
    * assignment is a per-row expression and ranking moves only
    * candidate triples.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Seq[Seq[Double]],
      nProbe: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      nearestCentroid(col(vecCol), centroids).as("cl"))
    // nProbe nearest lists per query: sort (dist, idx) pairs, slice
    val qDists = array(centroids.zipWithIndex.map { case (cent, i) =>
      struct(sqDist(col("qv"), cent).as("d"), lit(i).as("cl"))
    }: _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("probes", slice(array_sort(qDists), 1, nProbe))
      .select(col("query_id"), col("qv"), explode(col("probes.cl")).as("cl"))
    val scored = c.join(broadcast(q), "cl")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", graft.functions.VectorColumns.cosine(col("qv"), col("nv")))
    rankTopK(scored, k)
  }

  /** Hard-negative mining for contrastive training (the DPR/SimCSE
    * recipe): per anchor, the k most-similar corpus vectors whose
    * cosine stays BELOW the near-dup threshold — similar enough to
    * be informative negatives, dissimilar enough not to be a
    * positive in disguise (a near-duplicate used as a negative
    * poisons the contrastive loss; Dedup.embeddingPairs finds those
    * at `dupTau`, this excludes them by the same cosine). Plan =
    * bruteForceTopK's shape (anchors broadcast, corpus streams,
    * per-partition top-k) with one more scan predicate — the corpus
    * still never shuffles.
    */
  def hardNegatives(
      corpus: DataFrame,
      anchors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dupTau: Double = 0.95): DataFrame = {
    val q = broadcast(anchors.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", graft.functions.VectorColumns.cosine(col("qv"), col("nv")))
      .filter(col("cos") < dupTau)
    rankTopK(scored, k)
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      // cos stays unrounded: the sequential-double cosine is
      // bit-reproducible (the q27 oracle recomputes it exactly);
      // round() half-way behavior is engine-specific
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }
}

package graft.ann

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.functions.VectorColumns
import graft.plans.Plans.barrier

/** Product quantization ANN (Jégou et al., TPAMI 2011): vectors are
  * split into `m` subspaces, each subvector replaced by the id of its
  * nearest codeword from a per-subspace codebook — a 64-float
  * embedding (256 B) becomes an m-byte code (m=8 ⇒ 32× compression).
  * Search is ADC (asymmetric distance): the EXACT query against the
  * reconstruction implied by each corpus row's code, then an exact
  * rerank of the short candidate list.
  *
  * The reference's similarity surface is brute-force cosine
  * (datanika `services/embedding_service.py` semantics); PQ is the
  * scale path the reference lacks:
  *
  *  - Codebooks are m × k × (dim/m) doubles (m=8, k=16, dim=64 ⇒ 1k
  *    scalars) — legitimately driver-held and codegen-captured, same
  *    rationale as IVF centroids (Ann.trainCentroids).
  *  - Training is Lloyd's over ALL subspaces in ONE aggregation per
  *    iteration (explode by subspace, decimal-exact means) — not m
  *    separate k-means jobs.
  *  - Encoding is a per-row expression (no shuffle); at 100 TB the
  *    hot index is (id, m bytes) — it fits where the raw vectors
  *    never would, and the candidate scan reads codes only.
  *  - Rerank fetches true vectors for only |Q|·rerankDepth candidate
  *    ids via a BROADCAST candidate join — the corpus streams, full
  *    vectors never shuffle.
  */
object Pq {

  /** Per-subspace Lloyd's k-means, one job per iteration across all
    * m subspaces. Deterministic: codeword c of subspace j initializes
    * from row c (by id order); means are decimal-exact so results are
    * independent of partial-aggregate merge order.
    *
    * Training runs on a deterministic hash-sample of the corpus
    * (`sampleTarget` rows, default 64·k — codebooks need ~O(100·k)
    * vectors to converge, not the corpus). At 100 TB training on the
    * full corpus is a non-starter: three full scans before search
    * starts. The sample is selected by an xxhash64 threshold on the
    * id — stable under repartitioning and re-runs — and when the
    * corpus is already ≤ target the filter is skipped entirely, so
    * small-corpus results are bit-identical to full-corpus training.
    */
  def trainCodebooks(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 3,
      sampleTarget: Int = -1): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val target = if (sampleTarget > 0) sampleTarget else 64 * k
    val train = Sampler.hashSample(vecs, idCol, target)
    val sub = dim / m
    var books: Seq[Seq[Seq[Double]]] = {
      val seed = train.orderBy(col(idCol)).limit(k)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Float](0).map(_.toDouble))
      (0 until m).map(j => seed.toSeq.map(v => v.slice(j * sub, j * sub + sub).toSeq))
    }
    for (_ <- 1 to iters) {
      val parts = (0 until m).map { j =>
        val sv = slice(col(vecCol), j * sub + 1, sub)
        struct(lit(j).as("j"),
          VectorColumns.nearestCentroid(sv, books(j)).as("cl"),
          sv.as("sv"))
      }
      val means = train
        .select(explode(array(parts: _*)).as("a"))
        .select(col("a.j"), col("a.cl"),
          posexplode(col("a.sv")).as(Seq("pos", "x")))
        .groupBy("j", "cl", "pos")
        .agg((sum(col("x").cast("decimal(28,10)")) / count(lit(1)))
          .cast("double").as("mv"))
        .collect()
      val byKey = means.groupBy(r => (r.getInt(0), r.getInt(1)))
      books = books.zipWithIndex.map { case (book, j) =>
        book.zipWithIndex.map { case (cw, c) =>
          byKey.get((j, c)) match {
            case Some(rows) => rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
            case None => cw // empty cluster keeps its codeword
          }
        }
      }
    }
    books
  }

  /** m-byte PQ code of a vector: per-subspace nearest codeword ids.
    * Pure per-row expression — encoding a 100 TB corpus is a scan.
    */
  def encode(vecCol: Column, dim: Int, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.length
    val sub = dim / m
    array((0 until m).map { j =>
      VectorColumns.nearestCentroid(slice(vecCol, j * sub + 1, sub), books(j))
    }: _*)
  }

  /** PQ top-k with exact rerank. Candidate generation scores the
    * broadcast queries against CODES ONLY (fused ADC cosine, no
    * reconstruction materialized); the top `rerankDepth` candidates
    * per query then fetch true vectors by broadcast id-join and the
    * final top-k ranks on exact cosine. Ties break on neighbor id.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      books: Seq[Seq[Seq[Double]]],
      rerankDepth: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the "index": id + m-byte code; barrier so the encode is
    // computed once, not re-derived under both window branches
    val index = barrier(corpus.select(col(idCol).as("neighbor_id"),
      encode(col(vecCol), dim, books).as("codes")))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val approx = index
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorColumns.pqCosine(col("qv"), col("codes"), books).as("acos"))
    val wa = Window.partitionBy("query_id")
      .orderBy(col("acos").desc, col("neighbor_id").asc)
    val cands = approx.withColumn("ark", row_number().over(wa))
      .filter(col("ark") <= rerankDepth)
      .select("query_id", "neighbor_id")
    // exact rerank: candidates are |Q|·rerankDepth rows — broadcast
    // them; the corpus streams past, no full-vector shuffle
    val fetched = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .join(broadcast(cands), "neighbor_id")
      .join(q, "query_id")
      .withColumn("cos", VectorColumns.cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    fetched.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** IVF-PQ with exact rerank — the composed production ANN shape
    * (FAISS `IVFx,PQy`; Jégou et al. 2011 §V): the coarse quantizer
    * routes each query to its `nProbe` nearest inverted lists and
    * the PQ codes score ONLY the probed lists' members, so the
    * candidate scan is sub-linear in the corpus AND reads m-byte
    * codes instead of raw vectors — IVF alone still scans full
    * vectors per probed list, PQ alone still scans every code; the
    * composition is what a billion-vector index actually runs.
    *
    * 100 TB shape: the hot index is (id, list, m bytes) — one
    * in-scan projection to build, no shuffle; queries (with their
    * probe fan-out) broadcast; the candidate join is keyed on the
    * list id; rerank fetches true vectors for |Q|·rerankDepth ids
    * via broadcast, the corpus streams. Driver state = nLists×dim
    * centroid scalars + m×k×(dim/m) codebook scalars (the
    * [[graft.ann.Ann.trainCentroids]] rationale).
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      centroids: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]],
      nProbe: Int = 2,
      rerankDepth: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the index: id + coarse list + m-byte code, one projection
    val index = barrier(corpus.select(col(idCol).as("neighbor_id"),
      VectorColumns.nearestCentroid(col(vecCol), centroids).as("cl"),
      encode(col(vecCol), dim, books).as("codes")))
    // nProbe nearest lists per query: rank the literal centroids
    val qDists = array(centroids.zipWithIndex.map { case (cent, i) =>
      struct(
        aggregate(zip_with(col("qv"), typedlit(cent),
          (x, c) => (x - c) * (x - c)), lit(0.0), (acc, x) => acc + x)
          .as("d"),
        lit(i).as("cl"))
    }: _*)
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("probes", slice(array_sort(qDists), 1, nProbe))
      .select(col("query_id"), col("qv"),
        explode(col("probes.cl")).as("cl")))
    val approx = index.join(q, "cl")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorColumns.pqCosine(col("qv"), col("codes"), books).as("acos"))
    val wa = Window.partitionBy("query_id")
      .orderBy(col("acos").desc, col("neighbor_id").asc)
    val cands = approx.withColumn("ark", row_number().over(wa))
      .filter(col("ark") <= rerankDepth)
      .select("query_id", "neighbor_id")
    val qv = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val fetched = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("nv"))
      .join(broadcast(cands), "neighbor_id")
      .join(qv, "query_id")
      .withColumn("cos", VectorColumns.cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    fetched.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }
}

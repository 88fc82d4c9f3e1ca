package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
  * 1998) — the diversity pass every RAG retrieval stack runs after
  * ANN: plain top-k returns five paraphrases of the same passage;
  * MMR greedily picks items that are RELEVANT to the query but
  * DISSIMILAR to what is already selected,
  *
  *   pick = argmax_{c ∈ C∖S} λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)
  *
  * over a small candidate pool C (the ANN top-n), selecting k.
  *
  * Scale shape: the greedy recursion is inherently sequential in k,
  * so it is UNROLLED into k plan stages — each stage one keyed
  * anti-join (drop selected), one keyed max over candidate↔selected
  * sims, one per-query top-1 window. All per-query data is
  * pool-sized (n candidates, n² sims), never corpus-sized: the
  * corpus was already reduced by [[Ann]] upstream, which is what
  * makes k unrolled stages of tiny keyed ops the honest plan rather
  * than a per-row loop. k and n are interactive-retrieval constants
  * (5–50), not data-scale knobs.
  *
  * Determinism: rel and sims are the sequential-double cosine
  * ([[graft.functions.VectorColumns.cosine]] — bit-reproducible,
  * the q27 contract), the objective is a fixed double chain on
  * identical inputs, ties break on neighbor id. An engine restating
  * these stages reproduces the selection bit-for-bit.
  */
object Mmr {

  /** @param cands (query_id, neighbor_id, rel, vec): the per-query
    *   candidate pool with relevance scores and embedding vectors.
    * @return (query_id, neighbor_id, pos, score): the k selections
    *   per query in pick order; `score` is the MMR objective at
    *   pick time (λ·rel for the first pick).
    */
  def rerank(cands: DataFrame, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda > 0 && lambda <= 1, s"lambda must be in (0,1]: $lambda")
    val base = cands.select(col("query_id"), col("neighbor_id"),
      col("rel"), col("vec"))
    val x = base.select(col("query_id"), col("neighbor_id").as("a"),
      col("vec").as("av"))
    val y = base.select(col("query_id"), col("neighbor_id").as("b"),
      col("vec").as("bv"))
    val sims = x.join(y, Seq("query_id"))
      .filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        graft.functions.VectorColumns.cosine(col("av"), col("bv"))
          .as("sim"))
    val pool = base.drop("vec")

    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    def top1(scored: DataFrame, pos: Int): DataFrame = scored
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("query_id"), col("neighbor_id"),
        lit(pos).as("pos"), col("score"))

    var selected = top1(
      pool.withColumn("score", lit(lambda) * col("rel")), 1)
    var step = 2
    while (step <= k) {
      val rem = pool.join(selected.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti")
      val mx = sims
        .join(selected.select(col("query_id"),
          col("neighbor_id").as("b")), Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a").as("neighbor_id"))
        .agg(max(col("sim")).as("max_sim"))
      val scored = rem.join(mx, Seq("query_id", "neighbor_id"))
        .withColumn("score",
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("max_sim"))
      selected = selected.unionByName(top1(scored, step))
      step += 1
    }
    selected.select(col("query_id"), col("neighbor_id"), col("pos"),
      col("score"))
  }
}

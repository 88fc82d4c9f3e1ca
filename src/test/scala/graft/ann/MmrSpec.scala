package graft.ann

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // one query; candidate 2 is an exact duplicate of candidate 1,
  // candidate 3 is orthogonal (irrelevant but diverse)
  private def pool = Seq(
    (10L, 1L, 1.0, Seq(1.0, 0.0)),
    (10L, 2L, 1.0, Seq(1.0, 0.0)),
    (10L, 3L, 0.0, Seq(0.0, 1.0)))
    .toDF("query_id", "neighbor_id", "rel", "vec")

  describe("Mmr.rerank") {
    it("prefers diversity over a duplicate when lambda is low") {
      // λ=0.3: the duplicate scores 0.3−0.7·1 = −0.4, the orthogonal
      // candidate 0 — diversity wins pick 2, the duplicate drops to 3
      val out = Mmr.rerank(pool, k = 3, lambda = 0.3)
        .orderBy("pos").collect()
        .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
      out.map(_._1).toSeq shouldBe Seq(1L, 3L, 2L)
      out(0)._3 shouldBe (0.3 +- 1e-12) // λ·rel for the first pick
      out(1)._3 shouldBe (0.0 +- 1e-12)
      out(2)._3 shouldBe (-0.4 +- 1e-12)
    }
    it("keeps taking duplicates when lambda is high (relevance-only)") {
      val out = Mmr.rerank(pool, k = 2, lambda = 0.9)
        .orderBy("pos").collect().map(_.getLong(1))
      out.toSeq shouldBe Seq(1L, 2L) // 0.9−0.1 = 0.8 > 0 for the dup
    }
    it("ties break on neighbor id, picks stop at pool exhaustion") {
      val out = Mmr.rerank(pool, k = 5, lambda = 0.3)
      out.count() shouldBe 3 // pool of 3 yields 3 picks, not 5
      out.orderBy("pos").collect().head.getLong(1) shouldBe 1L
    }
  }
}

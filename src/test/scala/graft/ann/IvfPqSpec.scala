package graft.ann

import graft.SparkSpec

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters in dim 4 (the AnnIvfSpec fixture)
  private lazy val vecs = ((0L to 9L).map(i =>
    (i, Array(10f + i * 0.1f, 0f, 0f, 1f))) ++
    (10L to 19L).map(i =>
      (i, Array(0f, 10f + i * 0.1f, 0f, 1f))))
    .toDF("vec_id", "embedding")

  describe("Pq.ivfPqTopK") {
    it("equals exact brute force at full probes and full rerank depth") {
      val cents = Ann.trainCentroids(vecs, "vec_id", "embedding",
        nLists = 2, iters = 4)
      val books = Pq.trainCodebooks(vecs, "vec_id", "embedding",
        dim = 4, m = 2, k = 4, iters = 2)
      val queries = vecs.filter($"vec_id" < 4)
      val composed = Pq.ivfPqTopK(vecs, queries, "vec_id", "embedding",
          dim = 4, k = 3, cents, books, nProbe = 2, rerankDepth = 20)
        .select("query_id", "neighbor_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val exact = Ann.bruteForceTopK(vecs, queries, "vec_id", "embedding",
          k = 3)
        .select("query_id", "neighbor_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      composed shouldBe exact
    }
    it("with nProbe=1 candidates stay inside the query's own cluster") {
      val cents = Ann.trainCentroids(vecs, "vec_id", "embedding",
        nLists = 2, iters = 4)
      val books = Pq.trainCodebooks(vecs, "vec_id", "embedding",
        dim = 4, m = 2, k = 4, iters = 2)
      val queries = vecs.filter($"vec_id" === 0L)
      val out = Pq.ivfPqTopK(vecs, queries, "vec_id", "embedding",
          dim = 4, k = 5, cents, books, nProbe = 1, rerankDepth = 20)
        .select("neighbor_id").as[Long].collect()
      // query 0 lives in the dim-0 cluster (ids 0..9)
      all(out.toSeq) should be < 10L
      out.length shouldBe 5
    }
  }
}

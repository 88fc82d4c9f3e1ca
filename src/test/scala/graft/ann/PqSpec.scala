package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Product quantization: codebook training determinism, encode
  * range, fused ADC cosine vs explicit reconstruction, and
  * recall@k of the rerank pipeline on a clustered corpus.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val k = 4

  // 60 vectors in 4 well-separated clusters + slight per-row jitter:
  // nearest neighbors of any row are its cluster-mates.
  private def corpus() = {
    val rnd = new scala.util.Random(7)
    (0 until 60).map { i =>
      val c = i % 4
      val base = Array.tabulate(dim)(d =>
        if (d % 4 == c) 1.0f else 0.05f)
      (i.toLong, base.map(x => x + rnd.nextFloat() * 0.01f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  describe("Pq.trainCodebooks") {
    it("is deterministic and shaped m x k x dim/m") {
      val df = corpus()
      val b1 = Pq.trainCodebooks(df, "vec_id", "embedding", dim, m, k, iters = 2)
      val b2 = Pq.trainCodebooks(df, "vec_id", "embedding", dim, m, k, iters = 2)
      b1 shouldBe b2
      b1.length shouldBe m
      all(b1.map(_.length)) shouldBe k
      all(b1.flatMap(_.map(_.length))) shouldBe dim / m
    }

    it("rejects a dim that does not split into m subspaces") {
      an[IllegalArgumentException] should be thrownBy
        Pq.trainCodebooks(corpus(), "vec_id", "embedding", dim, m = 3, k = k)
    }
  }

  describe("Pq.encode") {
    it("emits m codes, each within [0, k)") {
      val df = corpus()
      val books = Pq.trainCodebooks(df, "vec_id", "embedding", dim, m, k, 2)
      val codes = df.select(Pq.encode(col("embedding"), dim, books).as("c"))
        .collect().map(_.getSeq[Int](0))
      all(codes.map(_.length)) shouldBe m
      codes.flatten.foreach { c => c should (be >= 0 and be < k) }
    }
  }

  describe("fused ADC cosine") {
    it("equals cosine against the explicit reconstruction") {
      val df = corpus()
      val books = Pq.trainCodebooks(df, "vec_id", "embedding", dim, m, k, 2)
      val rows = df
        .select(col("embedding"),
          Pq.encode(col("embedding"), dim, books).as("codes"))
        .withColumn("adc", graft.functions.VectorColumns.pqCosine(
          col("embedding"), col("codes"), books))
        .collect()
      rows.foreach { r =>
        val v = r.getSeq[Float](0).map(_.toDouble)
        val codes = r.getSeq[Int](1)
        val recon = codes.zipWithIndex.flatMap { case (c, j) => books(j)(c) }
        val dot = v.zip(recon).map { case (a, b) => a * b }.sum
        val expected = dot / math.sqrt(
          v.map(x => x * x).sum * recon.map(x => x * x).sum)
        r.getDouble(2) shouldBe expected +- 1e-12
      }
    }
  }

  describe("Pq.pqTopK") {
    it("returns k rows per query, ranked by exact cosine, with high recall") {
      val df = corpus()
      val queries = df.filter(col("vec_id") < 4)
      val books = Pq.trainCodebooks(df, "vec_id", "embedding", dim, m, k, 3)
      val approx = Pq.pqTopK(df, queries, "vec_id", "embedding", dim,
        k = 5, books, rerankDepth = 15)
      val exact = Ann.bruteForceTopK(df, queries, "vec_id", "embedding", 5)

      val byQuery = approx.collect().groupBy(_.getLong(0))
      byQuery.keySet shouldBe Set(0L, 1L, 2L, 3L)
      byQuery.values.foreach { rows =>
        rows.length shouldBe 5
        // rk orders by exact cosine desc
        rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq shouldBe
          rows.map(_.getDouble(2)).sortBy(-_).toSeq
      }
      val approxPairs = approx.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exactPairs = exact.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // clustered corpus: candidate lists must recover ≥80% overall
      (approxPairs & exactPairs).size.toDouble / exactPairs.size should be >= 0.8
    }
  }
}

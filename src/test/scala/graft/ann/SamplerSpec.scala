package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Training-sample selection: identity under target, determinism,
  * approximate size, and partition independence above target.
  */
class SamplerSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) =
    (0 until n).map(i => (i.toLong, Seq.fill(4)(i.toFloat))).toDF("vec_id", "embedding")

  describe("Sampler.hashSample") {
    it("is the identity when the corpus is at or under the target") {
      val df = vecs(100)
      Sampler.hashSample(df, "vec_id", 100).collect() shouldBe df.collect()
      Sampler.hashSample(df, "vec_id", 500).collect() shouldBe df.collect()
    }

    it("selects the same ids regardless of partitioning") {
      val a = Sampler.hashSample(vecs(2000), "vec_id", 200)
        .select("vec_id").collect().map(_.getLong(0)).sorted
      val b = Sampler.hashSample(vecs(2000).repartition(13), "vec_id", 200)
        .select("vec_id").collect().map(_.getLong(0)).sorted
      a shouldBe b
      a.length should (be >= 120 and be <= 320) // ~target, hash variance
    }

    it("rejects a non-positive target") {
      an[IllegalArgumentException] should be thrownBy
        Sampler.hashSample(vecs(10), "vec_id", 0)
    }
  }

  describe("sampled codebook training") {
    it("keeps pqTopK recall on a clustered corpus when sampling is forced") {
      // 4 well-separated clusters (same construction as PqSpec);
      // training on a forced half-sample must still learn the cluster
      // structure well enough for the rerank pipeline to recover the
      // exact neighbors.
      val dim = 16
      val rnd = new scala.util.Random(7)
      val df = (0 until 120).map { i =>
        val c = i % 4
        val base = Array.tabulate(dim)(d => if (d % 4 == c) 1.0f else 0.05f)
        (i.toLong, base.map(x => x + rnd.nextFloat() * 0.01f).toSeq)
      }.toDF("vec_id", "embedding")
      val queries = df.filter(col("vec_id") < 4)
      val books = Pq.trainCodebooks(df, "vec_id", "embedding", dim,
        m = 4, k = 4, iters = 3, sampleTarget = 60)
      // rerankDepth must cover a whole cluster (~30 rows): PQ codes
      // collapse cluster-mates to identical ADC scores, so a shallower
      // candidate list is an id-tiebreak lottery, not a recall signal
      val approx = Pq.pqTopK(df, queries, "vec_id", "embedding", dim,
        k = 5, books, rerankDepth = 30)
      val exact = Ann.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      val ap = approx.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ep = exact.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (ap & ep).size.toDouble / ep.size should be >= 0.8
    }
  }
}

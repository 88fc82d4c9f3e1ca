package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1L to 1000L).map(i => (i, if (i % 3 == 0) "a" else "b"))
    .toDF("k", "stratum")

  describe("systematic") {
    it("keeps exactly the multiples of `every` and is deterministic") {
      val s1 = Sampling.systematic(df, "k", 10).select("k").as[Long].collect().sorted
      val s2 = Sampling.systematic(df, "k", 10).select("k").as[Long].collect().sorted
      s1 shouldBe (10L to 1000L by 10L).toArray
      s2 shouldBe s1
    }
    it("rejects every < 1") {
      an[IllegalArgumentException] should be thrownBy Sampling.systematic(df, "k", 0)
    }
  }

  describe("stratified") {
    it("applies per-stratum denominators with the default for unlisted strata") {
      val out = Sampling.stratified(df, "stratum", "k", Map("a" -> 4L), 100L)
      val a = out.filter($"stratum" === "a").count()
      val b = out.filter($"stratum" === "b").count()
      // stratum a = multiples of 3, sampled 1-in-4 on k → multiples
      // of 12 ≤ 1000 → 83; stratum b 1-in-100 → k ∈ {100..1000}
      // not divisible by 3 → 7
      a shouldBe 83L
      b shouldBe 7L
    }
  }

  describe("hashFraction") {
    it("is deterministic and lands near the requested fraction") {
      val out1 = Sampling.hashFraction(df, Seq("k"), 0.2).select("k").as[Long].collect().sorted
      val out2 = Sampling.hashFraction(df, Seq("k"), 0.2).select("k").as[Long].collect().sorted
      out1 shouldBe out2
      out1.length.toDouble should (be > 100.0 and be < 300.0) // 200 ± 100
    }
    it("fraction 0 keeps nothing, 1 keeps everything") {
      Sampling.hashFraction(df, Seq("k"), 0.0).count() shouldBe 0L
      Sampling.hashFraction(df, Seq("k"), 1.0).count() shouldBe 1000L
    }
  }
}

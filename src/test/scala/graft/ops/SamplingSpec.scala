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

  describe("mix30") {
    it("matches TextHashExprs.mix30 exactly") {
      import org.apache.spark.sql.functions.col
      val keys = (0L until 512L) ++ Seq(1L << 29, (1L << 30) - 1)
      val got = keys.toDF("k")
        .select(col("k"), Sampling.mix30(col("k")).as("m"))
        .as[(Long, Long)].collect().toMap
      keys.foreach { k =>
        got(k) shouldBe graft.functions.TextHashExprs.mix30(k)
      }
    }
  }

  describe("mixtureFractions") {
    it("keeps the binding stratum whole, scales the rest to the budget") {
      val f = Sampling.mixtureFractions(
        Map("web" -> 700L, "books" -> 600L, "code" -> 600L),
        Map("web" -> 0.7, "books" -> 0.2, "code" -> 0.1))
      // budgets: web 1000, books 3000, code 6000 → web binds at 1000
      f("web") shouldBe 1.0 +- 1e-12
      f("books") shouldBe (1000.0 * 0.2 / 600) +- 1e-12
      f("code") shouldBe (1000.0 * 0.1 / 600) +- 1e-12
    }
    it("ignores weighted strata with no supply; empty weights → empty") {
      Sampling.mixtureFractions(Map("a" -> 10L), Map("a" -> 0.5, "b" -> 0.5))
        .keySet shouldBe Set("a")
      Sampling.mixtureFractions(Map("a" -> 10L), Map.empty) shouldBe Map.empty
    }
  }

  describe("sqrtTemperatureWeights") {
    it("the smallest source binds (kept whole); shares flatten toward √T") {
      val supply = Map("web" -> 90000L, "wiki" -> 10000L, "code" -> 40000L)
      val f = Sampling.mixtureFractions(supply,
        Sampling.sqrtTemperatureWeights(supply))
      // binding stratum = smallest (T/√T = √T is minimal there)
      f("wiki") shouldBe 1.0 +- 1e-12
      // kept tokens T_s·f_s ∝ √T_s: web keeps √(90000·10000) = 30000
      (supply("web") * f("web")) shouldBe 30000.0 +- 1e-6
      (supply("code") * f("code")) shouldBe 20000.0 +- 1e-6
    }
    it("zero-supply sources are dropped, not divided by") {
      Sampling.sqrtTemperatureWeights(Map("a" -> 0L, "b" -> 4L)) shouldBe
        Map("b" -> 2.0)
    }
  }

  describe("temperatureWeights (general α, engine-local)") {
    val supply = Map("web" -> 90000L, "wiki" -> 10000L, "code" -> 40000L)
    it("α = 0.5 equals the sqrt path bit-for-bit") {
      Sampling.temperatureWeights(supply, 0.5) shouldBe
        Sampling.sqrtTemperatureWeights(supply)
    }
    it("α = 1 reproduces raw proportions (every stratum binds)") {
      val f = Sampling.mixtureFractions(supply,
        Sampling.temperatureWeights(supply, 1.0))
      f.values.foreach(_ shouldBe 1.0 +- 1e-12)
    }
    it("kept tokens track T^α against a driver-computed expectation") {
      val a = 0.3
      val f = Sampling.mixtureFractions(supply,
        Sampling.temperatureWeights(supply, a))
      f("wiki") shouldBe 1.0 +- 1e-12 // smallest still binds for α < 1
      // kept_s = budget·T_s^α with budget = T_wiki^(1-α)
      val budget = math.pow(10000.0, 1 - a)
      (supply("web") * f("web")) shouldBe
        (budget * math.pow(90000.0, a)) +- 1e-6
      (supply("code") * f("code")) shouldBe
        (budget * math.pow(40000.0, a)) +- 1e-6
    }
    it("dyadic α run as correctly-rounded sqrt chains") {
      val t = Map("x" -> 81L)
      Sampling.temperatureWeights(t, 0.25) shouldBe Map("x" -> 3.0)
      Sampling.temperatureWeights(t, 0.75) shouldBe Map("x" -> 27.0)
    }
    it("rejects α outside (0, 1]") {
      an[IllegalArgumentException] should be thrownBy
        Sampling.temperatureWeights(supply, 0.0)
      an[IllegalArgumentException] should be thrownBy
        Sampling.temperatureWeights(supply, 1.5)
    }
  }

  describe("mixtureByTokens") {
    it("achieves the target token mixture within hash-threshold noise") {
      import org.apache.spark.sql.functions.{col, lit, sum}
      val rows = (0L until 3000L).map { i =>
        (i, if (i % 3 == 0) "web" else if (i % 3 == 1) "books" else "code", 10L)
      }
      val d = rows.toDF("doc_id", "stratum", "tok")
      val weights = Map("web" -> 0.6, "books" -> 0.3, "code" -> 0.1)
      val kept = Sampling.mixtureByTokens(d, "stratum", "doc_id", col("tok"), weights)
      val byStratum = kept.groupBy("stratum")
        .agg(sum(col("tok")).as("t")).as[(String, Long)].collect().toMap
      // supplies equal (10k each) → web binds; kept web = all 10000
      byStratum("web") shouldBe 10000L
      val total = byStratum.values.sum.toDouble
      byStratum("books") / total shouldBe 0.3 +- 0.05
      byStratum("code") / total shouldBe 0.1 +- 0.05
      // deterministic: same rows on a rerun
      Sampling.mixtureByTokens(d, "stratum", "doc_id", col("tok"), weights)
        .select("doc_id").as[Long].collect().sorted shouldBe
        kept.select("doc_id").as[Long].collect().sorted
      // strata without a weight are dropped
      Sampling.mixtureByTokens(d, "stratum", "doc_id", col("tok"),
        Map("web" -> 1.0)).filter(col("stratum") =!= lit("web"))
        .count() shouldBe 0L
    }
  }

  describe("capPerKey") {
    // skewed on purpose: "big" is the mega-key the salting exists
    // for, "tiny" sits under the cap entirely.
    lazy val data = ((1L to 150L).map(i => (i, "big")) ++
      (200L to 219L).map(i => (i, "mid")) ++
      (300L to 302L).map(i => (i, "tiny"))).toDF("id", "key")

    def expected(cap: Int): Set[(String, Long)] = {
      val pri = data.select(col("key"), col("id"),
        Sampling.mix30(col("id")).as("p")).as[(String, Long, Long)].collect()
      pri.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        rs.sortBy(r => (r._3, r._2)).take(cap).map(r => (k, r._2)).toSeq
      }.toSet
    }

    it("keeps exactly the cap smallest (mix30, id) rows per key through the salted path") {
      val out = Sampling.capPerKey(data, "key", "id", cap = 5, saltBuckets = 4)
        .select("key", "id").as[(String, Long)].collect().toSet
      out shouldBe expected(5)
      out.count(_._1 == "big") shouldBe 5
      out.count(_._1 == "tiny") shouldBe 3 // cap above group size keeps all
    }

    it("is salt-invariant: any saltBuckets yields the same survivors") {
      val base = Sampling.capPerKey(data, "key", "id", 7, 1)
        .select("key", "id").as[(String, Long)].collect().toSet
      base shouldBe expected(7)
      Seq(2, 5, 16).foreach { s =>
        Sampling.capPerKey(data, "key", "id", 7, s)
          .select("key", "id").as[(String, Long)].collect().toSet shouldBe base
      }
    }

    it("rejects cap or saltBuckets < 1") {
      an[IllegalArgumentException] should be thrownBy
        Sampling.capPerKey(data, "key", "id", 0)
      an[IllegalArgumentException] should be thrownBy
        Sampling.capPerKey(data, "key", "id", 5, 0)
    }
  }

  describe("neymanAllocation") {
    import spark.implicits._

    it("allocates budget toward the variable stratum") {
      // flat: 200 rows of constant 10; wild: 200 rows spanning 0..199
      val rows = (1 to 200).map(i => ("flat", 10.0)) ++
        (0 until 200).map(i => ("wild", i.toDouble))
      val r = Sampling.neymanAllocation(rows.toDF("s", "v"), "s", "v", 100)
        .orderBy("stratum").collect()
      // constant stratum: sd 0 → zero allocation
      r(0).getDouble(2) shouldBe 0.0
      r(0).getLong(4) shouldBe 0
      // all budget flows to the variable stratum
      r(1).getLong(4) shouldBe 100
      r(1).getDouble(3) shouldBe 1.0
    }

    it("equal strata split the budget evenly and caps apply") {
      val rows = (0 until 50).flatMap(i =>
        Seq(("a", i.toDouble), ("b", i.toDouble)))
      val r = Sampling.neymanAllocation(rows.toDF("s", "v"), "s", "v", 200)
        .orderBy("stratum").collect()
      // budget 200 over 100 rows: allocation caps at N_h = 50 each
      r.map(_.getLong(4)).toSeq shouldBe Seq(50L, 50L)
      r.map(_.getDouble(5)).toSeq shouldBe Seq(1.0, 1.0)
    }

    it("single-row strata get sd 0 and no allocation") {
      val rows = Seq(("one", 42.0)) ++ (0 until 20).map(i => ("m", i.toDouble))
      val r = Sampling.neymanAllocation(rows.toDF("s", "v"), "s", "v", 10)
        .orderBy("stratum").collect()
      val one = r.find(_.getString(0) == "one").get
      one.getDouble(2) shouldBe 0.0
      one.getLong(4) shouldBe 0
    }
  }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShapleyForecastSpec extends SparkSpec {
  import spark.implicits._

  describe("Shapley") {
    it("weights sum to 1 over any coalition path") {
      // Σ_{S ∌ c} |S|!(k−1−|S|)!/k! = 1 for every c
      val (w, den) = Shapley.weights(4)
      val total = Shapley.terms(4, 0).map {
        case (num, _, _) => num }.sum
      total shouldBe den
      w shouldBe Seq(6L, 2L, 2L, 6L)
    }
    it("credits the converting channel and debits the dead one") {
      // users touching only A convert, only-B users don't; the
      // grand coalition {a,b} is unobserved (v = 0), so efficiency
      // forces φ_a + φ_b = 0 with the credit on A
      val events = Seq(
        (1L, "a"), (1L, "buy"), (2L, "a"), (2L, "buy"),
        (3L, "b"), (4L, "b")).toDF("u", "et")
      val census = Shapley.census(events, "u",
        Seq(col("et") === "a", col("et") === "b"),
        col("et") === "buy")
      val out = Shapley.attribute(census, Seq("a", "b")).collect()
        .map(r => r.getAs[String]("channel") ->
          r.getAs[Double]("phi")).toMap
      out("a") shouldBe 0.5 +- 1e-9
      out("b") shouldBe -0.5 +- 1e-9
    }
    it("splits credit equally between symmetric channels") {
      // converters touched BOTH a and b; v({a})=v({b})=0 unobserved
      val events = Seq(
        (1L, "a"), (1L, "b"), (1L, "buy"),
        (2L, "a"), (2L, "b"), (2L, "buy")).toDF("u", "et")
      val census = Shapley.census(events, "u",
        Seq(col("et") === "a", col("et") === "b"),
        col("et") === "buy")
      val out = Shapley.attribute(census, Seq("a", "b")).collect()
        .map(r => r.getAs[Double]("phi"))
      out(0) shouldBe out(1)
      out.sum shouldBe 1.0 +- 1e-9 // efficiency: Σφ = v(full set)
    }
  }

  describe("ForecastEval.holtScorecard") {
    it("scores a constant series with zero error after the seed") {
      val daily = (0L to 9L).map(d => ("g", d, 100L)).toDF("g", "t", "x")
      val fc = Ewma.holt(daily, 1, 4, 1, 10)
      val r = ForecastEval.holtScorecard(fc, daily).collect().head
      r.getAs[Long]("n_scored") shouldBe 9L
      r.getAs[Double]("mae") shouldBe 0.0
      r.getAs[Double]("smape") shouldBe 0.0
    }
    it("reports positive error for a step change") {
      val daily = ((0L to 4L).map(d => ("g", d, 100L)) ++
        (5L to 9L).map(d => ("g", d, 200L))).toDF("g", "t", "x")
      val fc = Ewma.holt(daily, 1, 4, 1, 10)
      val r = ForecastEval.holtScorecard(fc, daily).collect().head
      r.getAs[Double]("mae") should be > 0.0
      r.getAs[Double]("smape") should be > 0.0
    }
  }

  describe("quality.Moments merge-don't-rescan") {
    import graft.quality.Moments
    it("merged batch states equal the direct computation exactly") {
      val all = (1 to 100).map(i => ("g", (i * 7 % 50 + 1).toLong))
        .toDF("g", "cents")
      val b1 = all.limit(40)
      val b2 = all.exceptAll(b1)
      val merged = Moments.merge(
        Seq(Moments.state(b1, Seq("g"), "cents"),
          Moments.state(b2, Seq("g"), "cents")), Seq("g"))
      val direct = Moments.state(all, Seq("g"), "cents")
      Moments.finalize(merged).collect() shouldBe
        Moments.finalize(direct).collect()
    }
    it("single-row keys report null variance") {
      val one = Seq(("g", 5L)).toDF("g", "cents")
      val r = graft.quality.Moments.finalize(
        graft.quality.Moments.state(one, Seq("g"), "cents"))
        .collect().head
      r.isNullAt(r.fieldIndex("variance")) shouldBe true
      r.getAs[Double]("mean") shouldBe 0.05
    }
  }

  describe("quality.Agreement.fleiss") {
    import graft.quality.Agreement
    it("perfect panel agreement scores kappa 1") {
      val df = Seq(("s", 10L), ("s", 300L), ("s", 10L), ("s", 400L))
        .toDF("g", "x")
      val r = Agreement.fleiss(df,
        Seq(col("x") > 100, col("x") > 100, col("x") > 100), "g")
        .collect().head
      r.getAs[Double]("kappa") shouldBe 1.0
    }
    it("an unanimous-everywhere panel has undefined kappa") {
      val df = Seq(("s", 1L), ("s", 2L)).toDF("g", "x")
      val r = Agreement.fleiss(df,
        Seq(col("x") > 0, col("x") > 0), "g").collect().head
      r.isNullAt(r.fieldIndex("kappa")) shouldBe true
    }
  }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MoversStrengthSpec extends SparkSpec {
  import spark.implicits._

  describe("TopMovers.movers") {
    it("surfaces the key whose share flipped") {
      // key 1: 50% → 10%; key 2: 50% → 90%
      val rows = (1 to 5).map(_ => (1L, false)) ++
        (1 to 5).map(_ => (2L, false)) ++
        (1 to 1).map(_ => (1L, true)) ++ (1 to 9).map(_ => (2L, true))
      val out = TopMovers.movers(rows.toDF("key", "b"), "key",
        col("b"), k = 2).collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[Double]("delta"))
        .toMap
      out(1L) shouldBe -0.4 +- 1e-9
      out(2L) shouldBe 0.4 +- 1e-9
    }
  }

  describe("StlStrength.indices") {
    it("scores a clean weekly pattern high F_seasonal, flat trend") {
      val series = (0L until 28L).map(d =>
        ("g", d, if (d % 7 == 0) 17L else 10L)).toDF("g", "day", "x")
      val r = StlStrength.indices(
        Stl.decompose(series, "g", "day", "x"), "g").collect().head
      r.getAs[Double]("f_seasonal") shouldBe 1.0 // zero residual
      // trend is flat: Var(T+R)=0 → null (stated)
      r.isNullAt(r.fieldIndex("f_trend")) shouldBe true
    }
    it("scores a pure linear trend high F_trend, no seasonality") {
      val series = (0L until 28L).map(d => ("g", d, d * 10L))
        .toDF("g", "day", "x")
      val r = StlStrength.indices(
        Stl.decompose(series, "g", "day", "x"), "g").collect().head
      r.getAs[Double]("f_trend") shouldBe 1.0 +- 1e-6
      // the clean line leaves zero seasonal+residual variance → null
      r.isNullAt(r.fieldIndex("f_seasonal")) shouldBe true
    }
  }

  describe("quality.RatioMetric.deltaZ") {
    import graft.quality.RatioMetric
    it("finds no effect on identical arms and flags a real shift") {
      // identical per-user (x, n) everywhere → the delta variance is
      // exactly zero → z undefined → null (stated)
      val same = (1 to 100).flatMap(u => Seq.fill(3)(
        ("g", u.toLong, u % 2 == 1, 1000L)))
      val r0 = RatioMetric.deltaZ(same.toDF("g", "u", "b", "x"),
        "g", "u", col("b"), "x").collect().head
      r0.isNullAt(r0.fieldIndex("z")) shouldBe true
      // arm b pays double per event, with per-user jitter so the
      // delta variance is positive
      val shifted = (1 to 100).flatMap { u =>
        val b = u % 2 == 1
        Seq.fill(3)(("g", u.toLong, b,
          (if (b) 2000L else 1000L) + (u % 7) * 10L))
      }
      val r1 = RatioMetric.deltaZ(shifted.toDF("g", "u", "b", "x"),
        "g", "u", col("b"), "x").collect().head
      r1.getAs[Boolean]("significant") shouldBe true
      r1.getAs[Double]("r_b") should be > r1.getAs[Double]("r_a")
    }
  }

  describe("dedup.LshAdvisor.thresholdCurve") {
    import graft.dedup.LshAdvisor
    it("counts pairs and affected docs monotonically in tau") {
      val pairs = Seq((1L, 2L, 0.95), (1L, 3L, 0.7), (4L, 5L, 0.55))
        .toDF("a", "b", "jaccard")
      val out = LshAdvisor.thresholdCurve(pairs, "a", "b", "jaccard",
        Seq(50, 70, 90)).collect()
        .map(r => r.getAs[Long]("tau_pct") ->
          (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs_affected")))
        .toMap
      out(50L) shouldBe ((3L, 5L))
      out(70L) shouldBe ((2L, 3L))
      out(90L) shouldBe ((1L, 2L))
    }
  }
}

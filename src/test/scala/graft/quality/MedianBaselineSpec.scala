package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MedianBaselineSpec extends SparkSpec {
  import spark.implicits._

  describe("MedianCi.interval") {
    it("finds the exact median and a covering interval") {
      val df = (1 to 101).map(i => ("g", i.toDouble)).toDF("g", "v")
      val r = MedianCi.interval(df, "g", "v").collect().head
      r.getAs[Long]("n") shouldBe 101L
      r.getAs[Double]("median") shouldBe 51.0
      // ranks 51 ∓ ~9.8: CI ≈ [41, 62] — must straddle the median
      r.getAs[Double]("ci_lo") should be < 51.0
      r.getAs[Double]("ci_hi") should be > 51.0
    }
    it("interpolates even-n medians between the middles") {
      val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0))
        .toDF("g", "v")
      MedianCi.interval(df, "g", "v").collect()
        .head.getAs[Double]("median") shouldBe 2.5
    }
  }

  describe("ops.ForecastEval.seasonalNaiveScorecard") {
    import graft.ops.ForecastEval
    it("scores a perfectly periodic series with zero error") {
      val daily = (0L until 21L).map(d =>
        ("g", d, 10L + (d % 7))).toDF("g", "t", "x")
      val r = ForecastEval.seasonalNaiveScorecard(daily, lag = 7)
        .collect().head
      r.getAs[Long]("n_scored") shouldBe 14L
      r.getAs[Double]("mae") shouldBe 0.0
      r.getAs[Double]("smape") shouldBe 0.0
    }
  }

  describe("Proportions.twoProportionZ") {
    it("flags a large conversion gap and nulls degenerate pools") {
      val rows = (1 to 200).map { i =>
        val b = i % 2 == 1
        ("g", b, if (b) (if (i % 10 < 8) 1L else 0L) // 80%
          else (if (i % 10 < 2) 1L else 0L)) // 20%
      }
      val r = Proportions.twoProportionZ(rows.toDF("g", "b", "hit"),
        "g", col("b"), "hit").collect().head
      r.getAs[Boolean]("significant") shouldBe true
      r.getAs[Double]("rate_b") shouldBe 0.8 +- 0.01
      val allZero = Seq(("g", false, 0L), ("g", true, 0L))
        .toDF("g", "b", "hit")
      val r0 = Proportions.twoProportionZ(allZero, "g", col("b"),
        "hit").collect().head
      r0.isNullAt(r0.fieldIndex("z")) shouldBe true
    }
  }
}

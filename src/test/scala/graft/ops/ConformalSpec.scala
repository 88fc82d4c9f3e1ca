package graft.ops

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  describe("Conformal.radiusCoverage") {
    it("takes the ceil((1-a)(n+1))-th smallest calibration residual") {
      // n_cal = 9, alpha = 0.1: k = ceil(0.9*10) = 9 -> radius = 9th
      // smallest of 1..9 = 9
      val cal = (1L to 9L).map(r => ("s", r, true))
      val test = Seq(("s", 5L, false), ("s", 9L, false), ("s", 12L, false))
      val out = Conformal.radiusCoverage((cal ++ test)
        .toDF("g", "resid", "is_cal")).collect().head
      out.getLong(out.fieldIndex("radius")) shouldBe 9L
      out.getLong(out.fieldIndex("n_cal")) shouldBe 9L
      // coverage: 5<=9 yes, 9<=9 yes, 12 no -> 2/3
      out.getDouble(out.fieldIndex("coverage")) shouldBe
        (2.0 / 3.0 +- 1e-8)
    }
    it("clamps k to n_cal when the window is too small for the level") {
      // n_cal = 3, alpha = 0.1: k = ceil(0.9*4) = 4 -> clamped to 3
      val df = (Seq(("s", 1L, true), ("s", 2L, true), ("s", 7L, true)) ++
        Seq(("s", 7L, false), ("s", 8L, false))).toDF("g", "resid", "is_cal")
      val out = Conformal.radiusCoverage(df).collect().head
      out.getLong(out.fieldIndex("radius")) shouldBe 7L
      out.getDouble(out.fieldIndex("coverage")) shouldBe 0.5
    }
    it("ties in residuals do not change the order statistic") {
      val df = (Seq.fill(5)(("s", 4L, true)) ++
        Seq(("s", 4L, false))).toDF("g", "resid", "is_cal")
      val out = Conformal.radiusCoverage(df).collect().head
      out.getLong(out.fieldIndex("radius")) shouldBe 4L
      out.getDouble(out.fieldIndex("coverage")) shouldBe 1.0
    }
  }
}

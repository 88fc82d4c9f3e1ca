package graft.ann

import graft.SparkSpec

class PcaPowerSpec extends SparkSpec {
  import spark.implicits._

  describe("PcaPower.topComponent") {
    it("finds the dominant variance direction") {
      // variance lives on dim 0 (spread ±10); dim 1 is noise ±1
      val vecs = (1 to 40).map { i =>
        Array((if (i % 2 == 0) 10f else -10f), (i % 3 - 1).toFloat)
      }.toDF("v")
      val out = PcaPower.topComponent(spark, vecs, "v", iters = 5)
        .collect().sortBy(_.getAs[Long]("d"))
      math.abs(out(0).getAs[Double]("loading")) shouldBe 1.0 +- 0.01
      math.abs(out(1).getAs[Double]("loading")) shouldBe 0.0 +- 0.05
      // nearly all variance explained by the component
      out(0).getAs[Double]("eig_share") shouldBe 1.0 +- 0.01
    }
    it("splits an isotropic pair evenly in eig_share") {
      // two equal-variance independent dims → share ≈ 0.5
      val vecs = (1 to 64).map { i =>
        Array((i % 2 * 2 - 1).toFloat, ((i / 2) % 2 * 2 - 1).toFloat)
      }.toDF("v")
      val r = PcaPower.topComponent(spark, vecs, "v", iters = 5)
        .collect().head
      r.getAs[Double]("eig_share") shouldBe 0.5 +- 0.05
    }
  }
}

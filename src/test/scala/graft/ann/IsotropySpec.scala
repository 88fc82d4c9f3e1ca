package graft.ann

import graft.SparkSpec

class IsotropySpec extends SparkSpec {
  import spark.implicits._

  describe("Isotropy.audit") {
    it("scores identical-direction vectors avg_cos ≈ 1") {
      val df = Seq.fill(10)(Array(1f, 2f, 2f)).toDF("v")
      val r = Isotropy.audit(df, "v").collect().head
      r.getAs[Long]("n_vecs") shouldBe 10L
      r.getAs[Long]("dim") shouldBe 3L
      r.getAs[Double]("avg_cos") shouldBe 1.0 +- 1e-6
      r.getAs[Double]("resultant_norm_frac") shouldBe 1.0 +- 1e-6
    }
    it("scores an antipodal pair avg_cos = −1") {
      val df = Seq(Array(1f, 0f), Array(-1f, 0f)).toDF("v")
      val r = Isotropy.audit(df, "v").collect().head
      r.getAs[Double]("avg_cos") shouldBe -1.0 +- 1e-6
      r.getAs[Double]("resultant_norm_frac") shouldBe 0.0 +- 1e-6
    }
    it("scores an orthogonal basis avg_cos = 0 and excludes zeros") {
      val df = Seq(Array(1f, 0f, 0f), Array(0f, 1f, 0f),
        Array(0f, 0f, 1f), Array(0f, 0f, 0f)).toDF("v")
      val r = Isotropy.audit(df, "v").collect().head
      r.getAs[Long]("n_vecs") shouldBe 3L // zero vector dropped
      r.getAs[Double]("avg_cos") shouldBe 0.0 +- 1e-6
    }
  }
}

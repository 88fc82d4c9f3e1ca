package graft.quality

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class BenfordSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  describe("Benford.audit") {
    it("probabilities sum to 1 and start at log10(2)") {
      Benford.P.sum shouldBe 1.0 +- 1e-12
      Benford.P.head shouldBe math.log10(2.0) +- 1e-15
    }

    it("a geometric sample follows Benford: small chi2") {
      // powers of a growth factor sweep magnitudes uniformly in log
      // space — the canonical Benford-conforming population
      val vs = (0 until 2000).map(i =>
        ("x", math.round(100.0 * math.pow(1.01, i))))
      val rows = Benford.audit(vs.toDF("k", "v"), "v")
        .orderBy("digit").collect()
      rows.length shouldBe 9
      rows.head.getDouble(5) should be < 20.0
      // digit-1 share near 30.1%
      rows.head.getDouble(2) shouldBe 0.301 +- 0.02
    }

    it("a constant-leading-digit population blows up chi2") {
      val vs = (1 to 1000).map(i => ("x", 500L + (i % 100)))
      val rows = Benford.audit(vs.toDF("k", "v"), "v")
        .orderBy("digit").collect()
      rows.head.getDouble(5) should be > 1000.0
      // all mass on digit 5, all nine digits still reported
      rows.map(_.getInt(0)).toSeq shouldBe (1 to 9)
      rows(4).getLong(1) shouldBe 1000
    }

    it("non-positive and null values are excluded") {
      val vs = Seq(("x", Some(123L)), ("x", Some(0L)), ("x", Some(-5L)),
        ("x", None))
      val rows = Benford.audit(vs.toDF("k", "v"), "v")
        .orderBy("digit").collect()
      rows.map(_.getLong(1)).sum shouldBe 1
    }
  }
}

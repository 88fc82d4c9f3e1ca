package graft.text

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class ZipfSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  describe("Zipf.fit") {
    it("recovers the exponent of a clean power law") {
      val rows = (1 to 100).map(r =>
        ("s", r.toLong, math.round(1e7 * math.pow(r, -0.8))))
      val got = Zipf.fit(rows.toDF("series", "rank", "freq"))
        .collect().head
      got.getLong(1) shouldBe 100
      got.getDouble(2) shouldBe 0.8 +- 0.01
      got.getDouble(3) shouldBe 1.0 +- 0.001
    }

    it("flat frequencies fit exponent 0") {
      val rows = (1 to 50).map(r => ("s", r.toLong, 1000L))
      val got = Zipf.fit(rows.toDF("series", "rank", "freq"))
        .collect().head
      got.getDouble(2) shouldBe 0.0 +- 1e-9
      // zero y-variance → r2 undefined
      got.isNullAt(3) shouldBe true
    }

    it("series fit independently; short heads null out") {
      val a = (1 to 100).map(r =>
        ("a", r.toLong, math.round(1e7 * math.pow(r, -1.2))))
      val b = Seq(("b", 1L, 10L), ("b", 2L, 5L))
      val rs = Zipf.fit((a ++ b).toDF("series", "rank", "freq"))
        .orderBy("series").collect()
      rs(0).getDouble(2) shouldBe 1.2 +- 0.01
      rs(1).isNullAt(2) shouldBe true
    }
  }
}

package graft.quality

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class ConcentrationSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    Concentration.gini(rows.toDF("g", "id", "x"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))

  describe("Concentration.gini") {
    it("perfect equality scores 0") {
      val r = run((1L to 10L).map(i => ("g", i, 100L))).head
      r._4.get shouldBe 0.0 +- 1e-9
    }

    it("total concentration approaches 1 - 1/n") {
      // one member owns everything: G = (n-1)/n
      val r = run(Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 0L),
        ("g", 4L, 1000L))).head
      r._4.get shouldBe 0.75 +- 1e-9
    }

    it("hand-checked half split") {
      // x = (0, 0, 50, 50): G = 2*(3*50+4*50)/(4*100) - 5/4 = 0.5
      val r = run(Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 50L),
        ("g", 4L, 50L))).head
      r._4.get shouldBe 0.5 +- 1e-9
    }

    it("zero-total groups report null; groups are independent") {
      val rs = run(Seq(("a", 1L, 0L), ("a", 2L, 0L),
        ("b", 1L, 5L), ("b", 2L, 5L)))
      rs(0)._4 shouldBe None
      rs(1)._4.get shouldBe 0.0 +- 1e-9
    }
  }
}

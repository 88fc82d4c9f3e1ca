package graft.quality

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class WeightedQuantileSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Double, Long, Long)],
      ps: Seq[Int] = Seq(25, 50, 75)) =
    WeightedQuantile.report(rows.toDF("g", "v", "w", "id"), ps)
      .orderBy("g").collect()

  describe("WeightedQuantile.report") {
    it("a heavy tail value owns the median") {
      // weights 1,1,1,7 → W=10; p50 needs cumw ≥ 5 → value 4
      val r = run(Seq(("g", 1.0, 1L, 1L), ("g", 2.0, 1L, 2L),
        ("g", 3.0, 1L, 3L), ("g", 4.0, 7L, 4L))).head
      r.getLong(1) shouldBe 10
      r.getDouble(3) shouldBe 4.0
      // p25 needs cumw ≥ 2.5 → first at cumw 3 → value 3
      r.getDouble(2) shouldBe 3.0
      r.getDouble(4) shouldBe 4.0
    }

    it("unit weights reduce to the inclusive lower percentile") {
      val r = run((1 to 100).map(i => ("g", i.toDouble, 1L, i.toLong))).head
      r.getDouble(2) shouldBe 25.0
      r.getDouble(3) shouldBe 50.0
      r.getDouble(4) shouldBe 75.0
    }

    it("p100 is the max value; zero-weight rows never win") {
      val r = run(Seq(("g", 0.5, 0L, 1L), ("g", 1.0, 3L, 2L),
        ("g", 9.0, 1L, 3L)), ps = Seq(100)).head
      r.getLong(1) shouldBe 4
      r.getDouble(2) shouldBe 9.0
    }

    it("groups are independent") {
      val rows = Seq(("a", 1.0, 1L, 1L), ("a", 5.0, 1L, 2L),
        ("b", 100.0, 2L, 3L), ("b", 200.0, 1L, 4L))
      val rs = run(rows, ps = Seq(50))
      rs(0).getDouble(2) shouldBe 1.0
      rs(1).getDouble(2) shouldBe 100.0
    }

    it("rejects bad percent lists") {
      an[IllegalArgumentException] should be thrownBy
        WeightedQuantile.report(
          Seq(("g", 1.0, 1L, 1L)).toDF("g", "v", "w", "id"), Seq(0))
    }
  }
}

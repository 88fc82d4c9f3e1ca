package graft.quality

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class DiscretizeSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  describe("Discretize.report") {
    it("splits a uniform column into near-equal quartiles") {
      val df = (1 to 400).map(i => ("g", i.toDouble)).toDF("g", "v")
      val rows = Discretize.report(df, "g", "v", nBins = 4)
        .orderBy("bin").collect()
      rows.map(_.getInt(1)).toSeq shouldBe Seq(0, 1, 2, 3)
      // type-7 interior cuts land ON data points; the <= side keeps them
      rows.map(_.getLong(2)).sum shouldBe 400
      all(rows.map(_.getLong(2))) should be >= 99L
      all(rows.map(_.getLong(2))) should be <= 101L
    }

    it("bounds chain: hi of bin b equals lo of bin b+1, extremes open") {
      val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
      val rows = Discretize.report(df, "g", "v", nBins = 4)
        .orderBy("bin").collect()
      rows.head.isNullAt(3) shouldBe true
      rows.last.isNullAt(4) shouldBe true
      rows.sliding(2).foreach { case Array(a, b) =>
        a.getDouble(4) shouldBe b.getDouble(3)
      }
    }

    it("heavy ties collapse cuts and skip the empty bin in between") {
      // 90% of mass at one value: c1 = c2 = c3 = 5 → all ties in bin 0
      val df = (Seq.fill(90)(5.0) ++ (1 to 10).map(_ + 100.0))
        .map(("g", _)).toDF("g", "v")
      val rows = Discretize.report(df, "g", "v", nBins = 4)
        .orderBy("bin").collect()
      rows.map(_.getInt(1)).toSeq shouldBe Seq(0, 3)
      rows.map(_.getLong(2)).toSeq shouldBe Seq(90L, 10L)
    }

    it("groups bin independently") {
      val df = ((1 to 100).map(("a", _)) ++ (1001 to 1100).map(("b", _)))
        .map { case (g, v) => (g, v.toDouble) }.toDF("g", "v")
      val rows = Discretize.report(df, "g", "v", nBins = 2)
        .orderBy("group_key", "bin").collect()
      rows.length shouldBe 4
      rows.map(_.getLong(2)).toSeq shouldBe Seq(50L, 50L, 50L, 50L)
    }

    it("rejects degenerate bin counts") {
      val df = Seq(("g", 1.0)).toDF("g", "v")
      an[IllegalArgumentException] should be thrownBy
        Discretize.report(df, "g", "v", nBins = 1)
    }
  }
}

package graft.quality

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class MultiOlsSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private def daily(rows: Seq[(String, Long, Long, Double)]) =
    rows.toDF("series", "x1", "x2", "value")

  describe("MultiOls.fit") {
    it("recovers an exact plane: y = 3 + 2*x1 + 5*x2, r2 = 1") {
      val rows = for (a <- 0L to 9L; b <- 0L to 4L)
        yield ("s", a, b, 3.0 + 2.0 * a + 5.0 * b)
      val r = MultiOls.fit(daily(rows)).collect().head
      r.getLong(1) shouldBe 50
      r.getDouble(2) shouldBe 3.0 +- 1e-6
      r.getDouble(3) shouldBe 2.0 +- 1e-6
      r.getDouble(4) shouldBe 5.0 +- 1e-6
      r.getDouble(5) shouldBe 1.0 +- 1e-6
    }

    it("controls for the confounder: trend vanishes once volume is held") {
      // y depends ONLY on x2 (volume); x1 (time) correlates with x2
      // but carries no independent effect → b1 ≈ 0
      val rows = for (t <- 0L to 19L; j <- 0L to 1L) yield {
        val vol = t + 3 * j
        ("s", t, vol, 10.0 + 4.0 * vol)
      }
      val r = MultiOls.fit(daily(rows)).collect().head
      r.getDouble(3) shouldBe 0.0 +- 1e-6
      r.getDouble(4) shouldBe 4.0 +- 1e-6
    }

    it("nulls out collinear features instead of dividing by zero") {
      val rows = (0L to 9L).map(i => ("s", i, 2 * i, 1.0 + i))
      val r = MultiOls.fit(daily(rows)).collect().head
      r.isNullAt(2) shouldBe true
      r.isNullAt(5) shouldBe true
    }

    it("nulls out under-determined series (n < 4)") {
      val rows = Seq(("s", 0L, 1L, 1.0), ("s", 1L, 0L, 2.0),
        ("s", 2L, 2L, 3.0))
      val r = MultiOls.fit(daily(rows)).collect().head
      r.isNullAt(2) shouldBe true
    }

    it("fits each series independently") {
      val a = (0L to 9L).flatMap(i => Seq(("a", i, i % 3, 1.0 + 2.0 * i +
        3.0 * (i % 3))))
      val b = (0L to 9L).flatMap(i => Seq(("b", i, i % 4, 5.0 + 7.0 * i +
        1.0 * (i % 4))))
      val rs = MultiOls.fit(daily(a ++ b)).orderBy("series").collect()
      rs(0).getDouble(3) shouldBe 2.0 +- 1e-6
      rs(1).getDouble(3) shouldBe 7.0 +- 1e-6
    }
  }
}

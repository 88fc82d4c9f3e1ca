package graft.quality

import graft.SparkSpec

/** Trend.ols contract: exact fit on a perfect line, null guards for
  * degenerate series (single point, zero variance).
  */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def ols(rows: (String, Long, Double)*) =
    Trend.ols(rows.toSeq.toDF("series", "day", "value"))
      .select("series", "n_days", "slope", "intercept", "r2")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq

  describe("Trend.ols") {
    it("recovers a perfect line exactly (slope 2, intercept 1, r2 1)") {
      ols(("m", 0L, 1.0), ("m", 1L, 3.0), ("m", 2L, 5.0),
        ("m", 3L, 7.0)) shouldBe Seq(
        ("m", 4L, Some(2.0), Some(1.0), Some(1.0)))
    }
    it("reports slope 0 with null r2 on a flat series (zero y-variance)") {
      ols(("f", 0L, 5.0), ("f", 1L, 5.0), ("f", 2L, 5.0)) shouldBe Seq(
        ("f", 3L, Some(0.0), Some(5.0), None))
    }
    it("nulls everything for a single-point series") {
      ols(("s", 7L, 9.0)) shouldBe Seq(("s", 1L, None, None, None))
    }
    it("fits each series independently") {
      val r = ols(("a", 0L, 0.0), ("a", 1L, 1.0),
        ("b", 0L, 10.0), ("b", 1L, 8.0))
      r.map(t => (t._1, t._3)) shouldBe Seq(
        ("a", Some(1.0)), ("b", Some(-2.0)))
    }
  }
}

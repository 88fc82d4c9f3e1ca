package graft.quality

import graft.SparkSpec

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fromRates(rates: Seq[(Long, Int, Int)]) = // (bucket, pos, neg)
    rates.flatMap { case (b, p, q) =>
      Seq.fill(p)((b, 1L)) ++ Seq.fill(q)((b, 0L))
    }.toDF("bucket", "y")

  describe("Isotonic.calibrate") {
    it("pools adjacent violators exactly like PAVA") {
      // observed rates 0.2, 0.6, 0.4, 0.8 — buckets 1 and 2 violate;
      // PAVA pools them (weights 5,5) to 0.5
      val df = fromRates(Seq((0L, 1, 4), (1L, 3, 2), (2L, 2, 3), (3L, 4, 1)))
      val out = Isotonic.calibrate(df).orderBy("bucket")
        .select("bucket", "fit").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      out.toSeq shouldBe Seq((0L, 0.2), (1L, 0.5), (2L, 0.5), (3L, 0.8))
    }
    it("already-monotone input passes through unchanged") {
      val df = fromRates(Seq((0L, 1, 9), (1L, 5, 5), (2L, 9, 1)))
      val out = Isotonic.calibrate(df).orderBy("bucket")
        .select("fit").collect().map(_.getDouble(0))
      out.toSeq shouldBe Seq(0.1, 0.5, 0.9)
    }
    it("a fully decreasing input pools to one global rate") {
      val df = fromRates(Seq((0L, 9, 1), (1L, 5, 5), (2L, 1, 9)))
      val out = Isotonic.calibrate(df).select("fit").distinct().collect()
      out.length shouldBe 1
      out.head.getDouble(0) shouldBe 0.5
    }
    it("pooling respects weights, not just rates") {
      // rate 1.0 (n=1) then 0.5 (n=10): pooled = 6/11, NOT the
      // unweighted rate average 0.75
      val df = fromRates(Seq((0L, 1, 0), (1L, 5, 5)))
      val out = Isotonic.calibrate(df).orderBy("bucket")
        .select("fit").collect().map(_.getDouble(0))
      out.toSeq shouldBe Seq(0.545454545, 0.545454545)
    }
    it("output is always non-decreasing") {
      val df = fromRates(Seq((0L, 3, 7), (1L, 9, 1), (2L, 2, 8),
        (3L, 5, 5), (4L, 1, 9)))
      val fits = Isotonic.calibrate(df).orderBy("bucket")
        .select("fit").collect().map(_.getDouble(0))
      fits.zip(fits.drop(1)).foreach { case (a, b) => a should be <= b }
    }
  }
}

package graft.quality

import graft.SparkSpec

/** Winsorize.report contract: the clamp tames a wild outlier,
  * per-side clamp census is exact, interior values pass untouched.
  */
class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  describe("Winsorize.report") {
    it("clamps both tails and reports the census") {
      // 1..9 plus a 10^6 outlier and a -10^6 one; p10/p90 pin tails
      val vals = (1 to 9).map(_.toDouble) ++ Seq(1e6, -1e6)
      val df = vals.map(("g", _)).toDF("grp", "v")
      val r = Winsorize.report(df, "grp", "v", pLo = 0.1, pHi = 0.9)
        .select("n", "n_clamped_lo", "n_clamped_hi", "lo", "hi",
          "mean_winsorized")
        .as[(Long, Long, Long, Double, Double, Double)].head()
      r._1 shouldBe 11L
      r._2 shouldBe 1L // only the -1e6
      r._3 shouldBe 1L // only the +1e6
      // mean is finite and within the clamp bounds — outliers tamed
      r._6 should (be >= r._4 and be <= r._5)
      r._6 should (be > 1.0 and be < 10.0)
    }
    it("leaves an outlier-free group effectively untouched") {
      val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("grp", "v")
      val r = Winsorize.report(df, "grp", "v", 0.0, 1.0)
        .select("n_clamped_lo", "n_clamped_hi", "mean_winsorized")
        .as[(Long, Long, Double)].head()
      r shouldBe ((0L, 0L, 5.5))
    }
    it("winsorizes each group independently") {
      val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
        ("b", 100.0), ("b", 200.0), ("b", 300.0)).toDF("grp", "v")
      val r = Winsorize.report(df, "grp", "v", 0.0, 1.0)
        .select("group_key", "mean_winsorized")
        .as[(String, Double)].collect().sortBy(_._1).toSeq
      r shouldBe Seq(("a", 2.0), ("b", 200.0))
    }
  }
}

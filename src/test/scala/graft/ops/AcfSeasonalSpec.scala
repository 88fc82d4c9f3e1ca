package graft.ops

import graft.SparkSpec

class AcfSeasonalSpec extends SparkSpec {
  import spark.implicits._

  describe("Acf.acf") {
    it("matches the hand-computed estimator on a small series") {
      // x = 1,2,3,4 (t=0..3): mean 2.5, den = Σ(x-x̄)² = 5
      // lag1: (1-2.5)(2-2.5)+(2-2.5)(3-2.5)+(3-2.5)(4-2.5) = 1.25
      // lag2: (1-2.5)(3-2.5)+(2-2.5)(4-2.5) = -1.5
      val df = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 2L, 3L),
        ("a", 3L, 4L)).toDF("g", "t", "x")
      val r = Acf.acf(df, 2).orderBy("lag").collect()
      r(0).getAs[Double]("r") shouldBe (0.25 +- 1e-12)
      r(0).getAs[Long]("n_pairs") shouldBe 3L
      r(1).getAs[Double]("r") shouldBe (-0.3 +- 1e-12)
    }

    it("perfect period-2 alternation scores r_2 near 1, r_1 negative") {
      val xs = Seq.tabulate(20)(i => ("a", i.toLong, if (i % 2 == 0) 10L else 0L))
      val r = Acf.acf(xs.toDF("g", "t", "x"), 2).orderBy("lag").collect()
      r(0).getAs[Double]("r") should be < 0.0
      r(1).getAs[Double]("r") should be > 0.85
    }

    it("constant series reports null r") {
      val df = Seq(("a", 0L, 5L), ("a", 1L, 5L), ("a", 2L, 5L))
        .toDF("g", "t", "x")
      val rows = Acf.acf(df, 1).collect()
      rows.head.isNullAt(rows.head.fieldIndex("r")) shouldBe true
    }

    it("series stay independent") {
      val df = (Seq.tabulate(6)(i => ("up", i.toLong, i.toLong)) ++
        Seq.tabulate(6)(i => ("flat", i.toLong, 7L))).toDF("g", "t", "x")
      val rows = Acf.acf(df, 1).collect()
      rows.length shouldBe 2
      rows.find(_.getString(0) == "up").get.getAs[Double]("r") should be > 0.0
      rows.find(_.getString(0) == "flat").get.isNullAt(3) shouldBe true
    }
  }

  describe("Seasonal.weekdayProfile") {
    it("computes exact indices with Monday = 0") {
      // 1970-01-05 (epoch day 4) was a Monday -> dow 0
      // two weeks: Mondays get 30, all other days 10
      val days = (4L to 17L).map(d =>
        ("a", d, if ((d + 3) % 7 == 0) 30L else 10L))
      val r = Seasonal.weekdayProfile(days.toDF("g", "day", "x"))
        .orderBy("dow").collect()
      r.length shouldBe 7
      r(0).getAs[Long]("dow") shouldBe 0L
      r(0).getAs[Double]("mean_x") shouldBe 30.0
      // overall mean = (2*30 + 12*10)/14 = 180/14; index = 30/(180/14) = 7/3
      r(0).getAs[Double]("seasonal_index") shouldBe (7.0 / 3 +- 1e-9)
      r(1).getAs[Double]("seasonal_index") shouldBe (7.0 / 9 +- 1e-9)
    }

    it("zero-total series reports null index but keeps means") {
      val df = Seq(("z", 4L, 0L), ("z", 5L, 0L)).toDF("g", "day", "x")
      val rows = Seasonal.weekdayProfile(df).collect()
      rows.foreach { r =>
        r.getAs[Double]("mean_x") shouldBe 0.0
        r.isNullAt(r.fieldIndex("seasonal_index")) shouldBe true
      }
    }
  }
}

package graft.quality

import graft.SparkSpec

class TClosenessSpec extends SparkSpec {
  import spark.implicits._

  describe("Anonymity.tCloseness") {
    it("scores a class matching the global distribution at EMD 0") {
      // global: a/b 50-50; class g1 mirrors it, g2 is all 'a'
      val df = Seq(("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "a"),
        ("g3", "b"), ("g3", "b")).toDF("g", "sv")
      val r = Anonymity.tCloseness(df, t = 0.2).orderBy("g").collect()
      r(0).getAs[Double]("emd") shouldBe 0.0
      r(0).getAs[Boolean]("t_violation") shouldBe false
      // g2: CumP = (1, 1) vs CumQ = (0.5, 1): EMD = 0.5/(2-1) = 0.5
      r(1).getAs[Double]("emd") shouldBe 0.5
      r(1).getAs[Boolean]("t_violation") shouldBe true
      r(2).getAs[Double]("emd") shouldBe 0.5
    }

    it("ordinal distance matters: far categories cost more") {
      // 3 ordered categories l < m < n; global uniform.
      // class A concentrated on 'l', class B on 'm'
      val rows = Seq("l", "m", "n").flatMap(c => Seq(("bg", c), ("bg", c))) ++
        Seq(("A", "l"), ("A", "l"), ("A", "l"),
          ("B", "m"), ("B", "m"), ("B", "m"))
      val r = Anonymity.tCloseness(rows.toDF("g", "sv"), t = 0.9)
        .orderBy("g").collect()
      val emdA = r(0).getAs[Double]("emd")
      val emdB = r(1).getAs[Double]("emd")
      emdA should be > emdB // mass at an extreme travels further
    }

    it("single-category table reports null (no order to move along)") {
      val df = Seq(("g1", "x"), ("g2", "x")).toDF("g", "sv")
      val rows = Anonymity.tCloseness(df, t = 0.2).collect()
      rows.foreach { r =>
        r.isNullAt(r.fieldIndex("emd")) shouldBe true
        r.isNullAt(r.fieldIndex("t_violation")) shouldBe true
      }
    }

    it("classes missing a category still integrate the full CDF") {
      // class 'z' has only the LAST category: its CDF is 0 until the
      // end, maximally far from a front-loaded global
      val df = Seq(("w", "a"), ("w", "a"), ("w", "a"), ("z", "c"))
        .toDF("g", "sv")
      val r = Anonymity.tCloseness(df, t = 0.2).orderBy("g").collect()
      r(1).getAs[Double]("emd") should be > r(0).getAs[Double]("emd")
    }
  }
}

package graft.ops

import graft.SparkSpec
import graft.quality.RankTests

class TheilSenSpearmanSpec extends SparkSpec {
  import spark.implicits._

  describe("TheilSen.slope") {
    it("recovers an exact linear trend") {
      val df = (0L to 10L).map(x => ("s", x, 3 * x + 7)).toDF("g", "x", "y")
      val r = TheilSen.slope(df).collect().head
      r.getDouble(r.fieldIndex("slope")) shouldBe 3.0
      r.getLong(r.fieldIndex("n_pairs")) shouldBe 55L
    }
    it("shrugs off a single wild outlier where OLS would not") {
      val df = ((0L to 10L).map(x => ("s", x, 2 * x)) :+ (("s", 11L, 1000L)))
        .toDF("g", "x", "y")
      val slope = TheilSen.slope(df).collect().head.getDouble(3)
      slope shouldBe (2.0 +- 0.2) // 66 pairs, only 11 touch the outlier
    }
    it("even pair counts average the two middle slopes") {
      // 4 points -> 6 pairs; sorted slopes 0,0,0,2,3,6 -> middle
      // two are 0 and 2 -> averaged to 1
      val df = Seq(("s", 0L, 0L), ("s", 1L, 0L), ("s", 2L, 0L),
        ("s", 3L, 6L)).toDF("g", "x", "y")
      TheilSen.slope(df).collect().head.getDouble(3) shouldBe 1.0
    }
  }

  describe("RankTests.spearman") {
    it("is 1 for any monotone relation, -1 for reversed") {
      val up = (1L to 8L).map(i => ("u", i, i * i)).toDF("g", "x", "y")
      RankTests.spearman(up, "g", "x", "y")
        .collect().head.getDouble(2) shouldBe 1.0
      val down = (1L to 8L).map(i => ("d", i, 100 - i * i))
        .toDF("g", "x", "y")
      RankTests.spearman(down, "g", "x", "y")
        .collect().head.getDouble(2) shouldBe -1.0
    }
    it("handles ties with mid-ranks (textbook value)") {
      // x: 1,2,3,4 ; y: 1,2,2,4 — tied ys share mid-rank 2.5
      // rho = 1 - 6*sum(d^2)/(n(n^2-1)) with d = (0, -0.5, 0.5, 0)
      // -> 1 - 6*0.5/60 = 0.95 (Pearson-on-ranks variant differs
      // slightly: compute directly instead)
      val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 2L),
        ("g", 4L, 4L)).toDF("g", "x", "y")
      val rho = RankTests.spearman(df, "g", "x", "y")
        .collect().head.getDouble(2)
      // doubled ranks: x (2,4,6,8); y (2,5,5,8): Pearson = 0.9487
      rho shouldBe (0.948683298 +- 1e-9)
    }
    it("constant columns report null (no rank variance)") {
      val df = Seq(("g", 1L, 5L), ("g", 2L, 5L)).toDF("g", "x", "y")
      val r = RankTests.spearman(df, "g", "x", "y").collect().head
      r.isNullAt(2) shouldBe true
    }
  }
}

package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankTestsSpec extends SparkSpec {
  import spark.implicits._

  // arm A = {1, 2, 3}, arm B = {2, 3, 4} in one stratum
  private def small = Seq(
    ("s", 1.0, 0), ("s", 2.0, 0), ("s", 3.0, 0),
    ("s", 2.0, 1), ("s", 3.0, 1), ("s", 4.0, 1))
    .toDF("g", "v", "arm")

  describe("RankTests.ksTest") {
    it("finds the max ECDF gap with the largest attaining value") {
      // ECDFs: at v=1 F_a=1/3 F_b=0 (gap 1/3); v=2 2/3 vs 1/3 (1/3);
      // v=3 1 vs 2/3 (1/3); v=4 1 vs 1 (0). Max gap 1/3, attained
      // at v=1,2,3 -> reports the largest, v=3.
      val r = RankTests.ksTest(small, "g", col("arm") === 1, "v")
        .collect().head
      r.getAs[Long]("n_a") shouldBe 3L
      r.getAs[Long]("n_b") shouldBe 3L
      r.getAs[Double]("d_stat") shouldBe (1.0 / 3 +- 1e-9)
      r.getAs[Double]("at_value") shouldBe 3.0
    }

    it("reports zero gap for identical samples") {
      val df = Seq(("s", 5.0, 0), ("s", 7.0, 0), ("s", 5.0, 1),
        ("s", 7.0, 1)).toDF("g", "v", "arm")
      val r = RankTests.ksTest(df, "g", col("arm") === 1, "v")
        .collect().head
      r.getAs[Double]("d_stat") shouldBe 0.0
    }

    it("keeps strata independent") {
      val df = small.union(Seq(("t", 1.0, 0), ("t", 100.0, 1))
        .toDF("g", "v", "arm"))
      val rows = RankTests.ksTest(df, "g", col("arm") === 1, "v")
        .orderBy("stratum").collect()
      rows.length shouldBe 2
      // disjoint supports -> D = 1
      rows(1).getAs[Double]("d_stat") shouldBe 1.0
    }
  }

  describe("RankTests.mannWhitney") {
    it("computes mid-rank U exactly under ties") {
      // pooled ranks: 1->1; {2,2}->2.5; {3,3}->4.5; 4->6
      // R_a = 1 + 2.5 + 4.5 = 8; U_a = 8 - 3*4/2 = 2
      val r = RankTests.mannWhitney(small, "g", col("arm") === 1, "v")
        .collect().head
      r.getAs[Double]("u_a") shouldBe 2.0
      // tie term: two pairs -> tsum = 2*(8-2) = 12
      // var = 9/12 * (7 - 12/30) = 4.95; z = (2-4.5)/sqrt(4.95)
      r.getAs[Double]("z") shouldBe (-2.5 / math.sqrt(4.95) +- 1e-6)
      r.getAs[Boolean]("significant") shouldBe false
    }

    it("degenerate variance (all values tied) reports null z") {
      val df = Seq(("s", 1.0, 0), ("s", 1.0, 0), ("s", 1.0, 1))
        .toDF("g", "v", "arm")
      val r = RankTests.mannWhitney(df, "g", col("arm") === 1, "v")
        .collect().head
      r.isNullAt(r.fieldIndex("z")) shouldBe true
      r.isNullAt(r.fieldIndex("significant")) shouldBe true
    }

    it("U_a + U_b = n_a * n_b (rank-sum identity)") {
      val a = RankTests.mannWhitney(small, "g", col("arm") === 1, "v")
        .collect().head
      val b = RankTests.mannWhitney(small, "g", col("arm") === 0, "v")
        .collect().head
      a.getAs[Double]("u_a") + b.getAs[Double]("u_a") shouldBe 9.0
    }
  }
}

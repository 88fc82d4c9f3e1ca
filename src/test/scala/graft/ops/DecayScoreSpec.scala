package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecayScoreSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String, Double)*) =
    rows.toDF("user", "day", "v").select(col("user"),
      to_date(col("day")).as("day"), col("v"))

  describe("DecayScore.score") {
    it("halves the weight every halfLifeDays relative to the newest day") {
      val out = DecayScore.score(
        df((1L, "2024-01-11", 8.0), // age 0  → w 1
          (1L, "2024-01-09", 8.0),  // age 2  → w 0.5
          (1L, "2024-01-07", 8.0),  // age 4  → w 0.25
          (1L, "2024-01-10", 8.0)), // age 1  → 1 div 2 = 0 → w 1
        "user", col("day"), "v", halfLifeDays = 2)
        .as[(Long, Long, Double, Double)].collect().head
      out shouldBe ((1L, 4L, 32.0, 8.0 + 4.0 + 2.0 + 8.0))
    }
    it("drops events beyond the maxHalvings horizon (not silently kept)") {
      val out = DecayScore.score(
        df((1L, "2024-02-20", 1.0), (1L, "2023-12-01", 100.0)), // 81 days → 40 halvings
        "user", col("day"), "v", halfLifeDays = 2)
        .as[(Long, Long, Double, Double)].collect().head
      out shouldBe ((1L, 1L, 1.0, 1.0))
    }
    it("rejects exponents decimal(20,18) cannot carry exactly") {
      an[IllegalArgumentException] should be thrownBy
        DecayScore.score(df((1L, "2024-01-01", 1.0)), "user", col("day"), "v",
          maxHalvings = 19)
    }
  }
}

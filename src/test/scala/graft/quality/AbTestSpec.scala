package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AbTestSpec extends SparkSpec {
  import spark.implicits._

  describe("AbTest.welch") {
    // A = [1,2,3] (mean 2, var 1); B = [2,3,4,5] (mean 3.5, var 5/3)
    // t = 1.5 / sqrt(5/12 + 1/3) = 1.5 / sqrt(0.75) = 1.732051
    it("matches the hand-computed Welch statistic") {
      val df = Seq(("x", false, 1.0), ("x", false, 2.0), ("x", false, 3.0),
        ("x", true, 2.0), ("x", true, 3.0), ("x", true, 4.0),
        ("x", true, 5.0)).toDF("stratum", "b", "v")
      val r = AbTest.welch(df, "stratum", col("b"), "v")
        .as[(String, Long, Long, Double, Double, Double, Boolean)]
        .collect().head
      r._2 shouldBe 3L
      r._3 shouldBe 4L
      r._4 shouldBe 2.0
      r._5 shouldBe 3.5
      r._6 shouldBe 1.732051
      r._7 shouldBe false
    }
    it("flags a clearly shifted arm as significant") {
      val rows = (1 to 200).map(i => ("s", false, 10.0 + (i % 3))) ++
        (1 to 200).map(i => ("s", true, 14.0 + (i % 3)))
      val r = AbTest.welch(rows.toDF("stratum", "b", "v"), "stratum",
        col("b"), "v").select("significant").as[Boolean].head()
      r shouldBe true
    }
  }
}

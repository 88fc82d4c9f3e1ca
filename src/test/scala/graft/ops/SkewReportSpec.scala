package graft.ops

import graft.SparkSpec

/** SkewReport.topKeys contract: ordering, shares, tiebreak, and the
  * TakeOrdered plan shape (no global sort).
  */
class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  private val rows =
    (Seq.fill(6)(7L) ++ Seq.fill(3)(1L) ++ Seq.fill(3)(2L) ++ Seq(9L))
      .toDF("k")

  describe("SkewReport.topKeys") {
    it("ranks by count desc with key-asc tiebreak and exact shares") {
      val r = SkewReport.topKeys(rows, "k", 3)
        .select("rank", "key", "n_rows", "share", "n_total", "n_distinct")
        .as[(Int, Long, Long, Double, Long, Long)].collect().toSeq
        .sortBy(_._1)
      r shouldBe Seq(
        (1, 7L, 6L, 0.461538462, 13L, 4L),
        (2, 1L, 3L, 0.230769231, 13L, 4L), // ties 1 vs 2 → smaller key
        (3, 2L, 3L, 0.230769231, 13L, 4L))
    }
    it("caps at k and plans the top-k as TakeOrdered, not a sort") {
      val df = SkewReport.topKeys(rows, "k", 2)
      df.count() shouldBe 2L
      val plan = df.queryExecution.executedPlan.toString
      plan should include("TakeOrderedAndProject")
    }
  }
}

package graft.ops

import graft.SparkSpec

/** CEP pattern contract (SequencePattern.firstThenWithout): first-B
  * selection, inclusive window edge, strict guard interval, and
  * independent matching of distinct As.
  */
class SequencePatternSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String, Long)*) =
    SequencePattern.firstThenWithout(
        rows.toSeq.toDF("u", "typ", "ms"), "u", "typ", "ms",
        a = "A", b = "B", guard = "C", windowMs = 100L)
      .select("user", "a_ms", "b_ms", "gap_ms")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  describe("SequencePattern.firstThenWithout") {
    it("picks the FIRST B in the window; later Bs are ignored") {
      run((1L, "A", 0L), (1L, "B", 30L), (1L, "B", 60L)) shouldBe
        Seq((1L, 0L, 30L, 30L))
    }
    it("includes B exactly at the window edge, excludes one past it") {
      run((1L, "A", 0L), (1L, "B", 100L)) shouldBe Seq((1L, 0L, 100L, 100L))
      run((1L, "A", 0L), (1L, "B", 101L)) shouldBe empty
    }
    it("a guard strictly between kills the match; at b_ms it does not") {
      run((1L, "A", 0L), (1L, "C", 50L), (1L, "B", 80L)) shouldBe empty
      run((1L, "A", 0L), (1L, "C", 80L), (1L, "B", 80L)) shouldBe
        Seq((1L, 0L, 80L, 80L))
    }
    it("a guard before A or after B is irrelevant") {
      run((1L, "C", -10L), (1L, "A", 0L), (1L, "B", 40L), (1L, "C", 90L)) shouldBe
        Seq((1L, 0L, 40L, 40L))
    }
    it("distinct As match independently (both can claim one B)") {
      run((1L, "A", 0L), (1L, "A", 10L), (1L, "B", 50L)) shouldBe
        Seq((1L, 0L, 50L, 50L), (1L, 10L, 50L, 40L))
    }
    it("users never cross-match") {
      run((1L, "A", 0L), (2L, "B", 50L)) shouldBe empty
    }
  }
}

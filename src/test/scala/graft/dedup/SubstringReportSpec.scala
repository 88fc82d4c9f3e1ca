package graft.dedup

import graft.SparkSpec

/** Repeated-substring exposure contract (Dedup.repeatedGramReport):
  * gram ownership is min-doc-id, "seen" is strictly-smaller owner
  * (a doc never counts its own grams), verbatim copies score 1.0,
  * short docs fall back to the whole-text gram.
  */
class SubstringReportSpec extends SparkSpec {
  import spark.implicits._

  private val eight = "one two three four five six seven eight"

  private def report(rows: (Long, String)*) =
    Dedup.repeatedGramReport(rows.toSeq.toDF("id", "text"), "id", "text",
        n = 8)
      .select("doc_id", "n_grams", "n_seen", "frac_repeated")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq

  describe("Dedup.repeatedGramReport") {
    it("scores a verbatim copy 1.0 and its original 0.0") {
      report(1L -> eight, 2L -> eight) shouldBe Seq(
        (1L, 1L, 0L, 0.0), (2L, 1L, 1L, 1.0))
    }
    it("attributes shared grams to the min id only (no self-count)") {
      // doc 3 = doc 1's text + fresh tail: its first 8-gram is owned
      // by doc 1; the tail-crossing grams are its own
      val r = report(1L -> eight, 3L -> s"$eight nine ten")
      r.head shouldBe ((1L, 1L, 0L, 0.0))
      val (_, nGrams, nSeen, frac) = r(1)
      nGrams shouldBe 3L // windows at offsets 0, 1, 2
      nSeen shouldBe 1L // only the copied prefix window
      frac shouldBe (1.0 / 3.0 +- 1e-9)
    }
    it("falls back to the whole-text gram under 8 tokens") {
      report(5L -> "tiny doc", 6L -> "tiny doc") shouldBe Seq(
        (5L, 1L, 0L, 0.0), (6L, 1L, 1L, 1.0))
    }
    it("is case-insensitive like the rest of the gram family") {
      report(7L -> eight, 8L -> eight.toUpperCase) shouldBe Seq(
        (7L, 1L, 0L, 0.0), (8L, 1L, 1L, 1.0))
    }
  }
}

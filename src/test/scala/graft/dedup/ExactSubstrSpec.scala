package graft.dedup

import graft.SparkSpec

class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  // doc1 is the canonical owner of every shared gram; doc2 shares one
  // interior 5-gram; doc3 is shorter than the window; doc4 repeats a
  // gram WITHIN itself; doc5 is entirely covered by two overlapping
  // shared grams
  private lazy val docs = Seq(
    (1L, "a b c d e f g h"),
    (2L, "x a b c d e y z"),
    (3L, "p q r s"),
    (4L, "m n o p q m n o p q"),
    (5L, "a b c d e f")).toDF("doc_id", "text")

  private lazy val out =
    ExactSubstr.excise(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)]
      .collect()

  describe("ExactSubstr.excise") {
    it("keeps the canonical (min doc, min pos) occurrence intact") {
      out(0) shouldBe ((1L, 8L, 0L, "a b c d e f g h"))
    }
    it("excises a shared interior window, keeping the flanks") {
      out(1) shouldBe ((2L, 8L, 5L, "x y z"))
    }
    it("leaves documents shorter than the window untouched") {
      out(2) shouldBe ((3L, 4L, 0L, "p q r s"))
    }
    it("excises within-document repeats, keeping the first") {
      out(3) shouldBe ((4L, 10L, 5L, "m n o p q"))
    }
    it("merges overlapping excised windows (can empty a doc)") {
      out(4) shouldBe ((5L, 6L, 6L, ""))
    }
    it("rejects degenerate window sizes") {
      an[IllegalArgumentException] should be thrownBy
        ExactSubstr.excise(docs, "doc_id", "text", k = 1)
    }
  }
}

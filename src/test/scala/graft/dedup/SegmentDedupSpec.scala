package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  describe("SegmentDedup.wordChunks") {
    it("chunks into fixed word windows, last one ragged") {
      val out = Seq("a b c d e")
        .toDF("text").select(SegmentDedup.wordChunks(col("text"), 2).as("c"))
        .head().getSeq[String](0)
      out shouldBe Seq("a b", "c d", "e")
    }
    it("empty text yields no chunks") {
      Seq("", "   ").toDF("text")
        .select(SegmentDedup.wordChunks(col("text"), 3).as("c"))
        .collect().map(_.getSeq[String](0)) shouldBe Array(Seq(), Seq())
    }
  }

  describe("SegmentDedup.dedupSegments") {
    it("keeps the globally first occurrence of each segment") {
      val docs = Seq(
        (1L, "x y z a b c"), // pos0: "x y z", pos1: "a b c"
        (2L, "a b c q r s"), // pos0 duplicates doc1/pos1 → dropped
        (3L, "x y z")        // duplicates doc1/pos0 → dropped entirely
      ).toDF("doc_id", "text")
      val out = SegmentDedup.dedupSegments(docs, "doc_id", "text", 3)
        .orderBy("doc_id")
        .as[(Long, Long, Long, String)].collect()
      out shouldBe Array(
        (1L, 2L, 2L, "x y z a b c"),
        (2L, 2L, 1L, "q r s"),
        (3L, 1L, 0L, ""))
    }
    it("within one doc the earlier position wins") {
      val docs = Seq((7L, "p q p q")).toDF("doc_id", "text")
      val out = SegmentDedup.dedupSegments(docs, "doc_id", "text", 2)
        .as[(Long, Long, Long, String)].head()
      out shouldBe ((7L, 2L, 1L, "p q"))
    }
    it("a doc with no segments still gets its contracted output row") {
      val docs = Seq((1L, "a b"), (2L, "   ")).toDF("doc_id", "text")
      val out = SegmentDedup.dedupSegments(docs, "doc_id", "text", 2)
        .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
      out shouldBe Array((1L, 1L, 1L, "a b"), (2L, 0L, 0L, ""))
    }
    it("reconstruction preserves original segment order") {
      val docs = Seq(
        (1L, "dup dup"),
        (2L, "keep one dup dup keep two")).toDF("doc_id", "text")
      // doc2 chunks of 2: "keep one", "dup dup"(dropped), "keep two"
      val out = SegmentDedup.dedupSegments(docs, "doc_id", "text", 2)
        .filter($"doc_id" === 2L).as[(Long, Long, Long, String)].head()
      out._4 shouldBe "keep one keep two"
    }
  }

  describe("SegmentDedup.dropFrequentSegments") {
    // 2-word segments; "b p" appears in 4 docs (df=4 > maxDf=3) →
    // dropped EVERYWHERE incl. its first occurrence; "c d" in 2 docs
    // (df=2) survives; a segment repeated within ONE doc has df=1.
    lazy val docs = Seq(
      (1L, "b p c d"),
      (2L, "b p c d"),
      (3L, "b p x y"),
      (4L, "b p"),
      (5L, "e f e f"), // within-doc repeat: df = 1, both copies kept
      (6L, "")         // no segments → contracted row
    ).toDF("doc_id", "text")

    def run(maxDf: Long) = SegmentDedup.dropFrequentSegments(
        docs, "doc_id", SegmentDedup.wordChunks(col("text"), 2), maxDf)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()

    it("drops every copy of over-threshold segments, keeps df<=maxDf and within-doc repeats") {
      run(3L) shouldBe Array(
        (1L, 2L, 1L, "c d"),
        (2L, 2L, 1L, "c d"),
        (3L, 2L, 1L, "x y"),
        (4L, 1L, 0L, ""),
        (5L, 2L, 2L, "e f e f"),
        (6L, 0L, 0L, ""))
    }

    it("df == maxDf is kept (strict > threshold)") {
      run(4L).map(r => (r._1, r._4)) shouldBe Array(
        (1L, "b p c d"), (2L, "b p c d"), (3L, "b p x y"),
        (4L, "b p"), (5L, "e f e f"), (6L, ""))
    }

    it("rejects maxDf < 1") {
      an[IllegalArgumentException] should be thrownBy
        SegmentDedup.dropFrequentSegments(docs, "doc_id",
          SegmentDedup.wordChunks(col("text"), 2), 0L)
    }
  }
}

package graft.dedup

import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "unrelated words entirely different content here now"))
    .toDF("doc_id", "text")

  describe("Dedup.containment") {
    it("finds a verbatim quote with high containment but low Jaccard") {
      // probe = first 6 tokens of doc 1 + padding: 4-of-7 grams
      // survive... actually: probe tokens = 6 + 2 pad = 8 -> 6 grams,
      // 4 of them ("alpha beta gamma".."delta epsilon zeta") in doc 1
      val probes = Seq(
        (100L, "alpha beta gamma delta epsilon zeta padx pady"))
        .toDF("doc_id", "text")
      val r = Dedup.containment(corpus, probes, "doc_id", "text",
        n = 3, tauPct = 60, minShared = 3).collect()
      r.length shouldBe 1
      r.head.getAs[Long]("corpus_id") shouldBe 1L
      r.head.getAs[Long]("n_shared") shouldBe 4L
      r.head.getAs[Long]("n_probe") shouldBe 6L
      r.head.getAs[Double]("containment") shouldBe (4.0 / 6 +- 1e-12)
      // Jaccard would be 4 / (6 + 6 - 4) = 0.5 < containment
    }

    it("integer threshold excludes pairs just under tau") {
      val probes = Seq(
        (100L, "alpha beta gamma delta epsilon zeta padx pady"))
        .toDF("doc_id", "text")
      // containment = 4/6 = 66.67% < 67%
      Dedup.containment(corpus, probes, "doc_id", "text",
        n = 3, tauPct = 67, minShared = 3).count() shouldBe 0L
      Dedup.containment(corpus, probes, "doc_id", "text",
        n = 3, tauPct = 66, minShared = 3).count() shouldBe 1L
    }

    it("minShared prunes incidental overlaps") {
      val probes = Seq((100L, "one two three padx pady pidz"))
        .toDF("doc_id", "text")
      // only 1 shared gram ("one two three") with doc 2
      Dedup.containment(corpus, probes, "doc_id", "text",
        n = 3, tauPct = 10, minShared = 2).count() shouldBe 0L
    }

    it("a probe fully inside its source scores containment 1.0") {
      val probes = Seq((100L, "two three four five six"))
        .toDF("doc_id", "text")
      val r = Dedup.containment(corpus, probes, "doc_id", "text",
        n = 3, tauPct = 100, minShared = 3).collect()
      r.length shouldBe 1
      r.head.getAs[Double]("containment") shouldBe 1.0
    }
  }
}

package graft.text

import graft.SparkSpec

/** DSIR scoring contract (Dsir.score): Laplace-smoothed importance
  * ratios hand-verified on a tiny corpus, occurrence multiplicity
  * (not distinct sets), target-resemblance ordering, and the
  * short-doc whole-text fallback.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def score(corpus: Seq[(Long, String)], target: Seq[String]) =
    Dsir.score(corpus.toDF("id", "text"),
        target.map(Tuple1(_)).toDF("text"), "id", "text")
      .select("doc_id", "n_grams", "dsir_score")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq

  describe("Dsir.score") {
    it("matches the hand-computed Laplace arithmetic") {
      // corpus grams: d1 {"a b"}, d2 {"x y"} → N_c=2, V=2;
      // target {"a b"} → N_t=1.
      // λ(a b) = (2/3)/(2/4) = 4/3 → 1.333333 after µ-quantization
      // λ(x y) = (1/3)/(2/4) = 2/3 → 0.666667
      score(Seq(1L -> "a b", 2L -> "x y"), Seq("a b")) shouldBe Seq(
        (1L, 1L, 1.333333), (2L, 1L, 0.666667))
    }
    it("counts gram occurrences, not the distinct set") {
      // "a b a b a" → bigrams (a b, b a, a b, b a): 4 occurrences
      val r = score(Seq(1L -> "a b a b a"), Seq("a b"))
      r.head._2 shouldBe 4L
    }
    it("ranks target-resembling docs above unrelated ones") {
      val r = score(
        Seq(1L -> "the quick brown fox", 2L -> "zzz qqq www vvv"),
        Seq("the quick brown fox jumps"))
      r(0)._3 should be > r(1)._3
    }
    it("falls back to the whole text under 2 tokens") {
      score(Seq(1L -> "solo"), Seq("solo")) shouldBe
        Seq((1L, 1L, 1.0)) // λ = (2/2)/(2/2) = 1 exactly
    }
  }
}

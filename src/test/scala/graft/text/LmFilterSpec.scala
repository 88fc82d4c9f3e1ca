package graft.text

import graft.SparkSpec

class LmFilterSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)], ref: Seq[String]) =
    LmFilter.unseenGramRatio(
      docs.toDF("id", "text"),
      ref.map(Tuple1(_)).toDF("text"), "id", "text", n = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList

  describe("LmFilter.unseenGramRatio") {
    it("computes exact distinct-bigram hit ratios") {
      // ref bigrams: {the quick, quick brown, brown fox}
      val got = score(
        Seq((1L, "the quick brown fox"), // all 3 seen → 0.0
          (2L, "lazy dog sleeps"), // 2 bigrams, none seen → 1.0
          (3L, "the quick red fox")), // {the quick} seen, {quick red, red fox} not
        Seq("the quick brown fox"))
      got shouldBe List(
        (1L, 3L, 0L, 0.0),
        (2L, 2L, 2L, 1.0),
        (3L, 3L, 2L, round9(2.0 / 3)))
    }

    it("counts DISTINCT grams per doc (repeats collapse)") {
      val got = score(Seq((1L, "go go go go")), Seq("stop"))
      // tokens [go,go,go,go] → distinct bigram {go go} → 1 gram
      got shouldBe List((1L, 1L, 1L, 1.0))
    }

    it("a single-token doc scores its whole text as one gram") {
      val got = score(Seq((1L, "hello")), Seq("hello"))
      got shouldBe List((1L, 1L, 0L, 0.0))
    }

    it("case folds before gram formation") {
      val got = score(Seq((1L, "The Quick BROWN fox")),
        Seq("the quick brown fox"))
      got.head._4 shouldBe 0.0
    }
  }

  private def round9(d: Double): Double =
    BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
}

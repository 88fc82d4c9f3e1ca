package graft.ops

import graft.SparkSpec

/** Association-rule contract (Baskets.pairRules): duplicate basket
  * lines collapse, counts and ratios match hand arithmetic, minCount
  * prunes, and pairs are canonically ordered (a < b, once).
  */
class BasketsSpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets: {1,2} {1,2} {1,3} {2} — with a duplicated line in b1
  private val lines = Seq(
    (10L, 1L), (10L, 2L), (10L, 2L), // dup line collapses
    (20L, 1L), (20L, 2L),
    (30L, 1L), (30L, 3L),
    (40L, 2L)
  ).toDF("bk", "it")

  private def rules(minCount: Long) =
    Baskets.pairRules(lines, "bk", "it", minCount)
      .select("item_a", "item_b", "n_ab", "n_a", "n_b",
        "support", "confidence", "lift")
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  describe("Baskets.pairRules") {
    it("computes support/confidence/lift on collapsed baskets") {
      // (1,2): n_ab=2, n_1=3, n_2=3, N=4 →
      //   support 0.5, confidence 2/3, lift 2·4/9
      rules(minCount = 2) shouldBe Seq(
        (1L, 2L, 2L, 3L, 3L, 0.5, 0.666666667, 0.888888889))
    }
    it("keeps sub-threshold pairs out; minCount=1 admits them") {
      val all = rules(minCount = 1)
      all.map(r => (r._1, r._2, r._3)) shouldBe Seq(
        (1L, 2L, 2L), (1L, 3L, 1L))
      // (1,3): confidence 1/3, lift 1·4/(3·1)
      all(1)._6 shouldBe 0.25
      all(1)._7 shouldBe 0.333333333
      all(1)._8 shouldBe 1.333333333
    }
    it("never emits a reversed or self pair") {
      rules(1).foreach { r => r._1 should be < r._2 }
    }
  }
}

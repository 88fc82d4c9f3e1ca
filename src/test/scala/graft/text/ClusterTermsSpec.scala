package graft.text

import graft.SparkSpec

/** ClusterTerms.label contract: distinguishing terms outrank shared
  * filler (which scores exactly 0), ranks are per-cluster with
  * deterministic tiebreak, topK caps.
  */
class ClusterTermsSpec extends SparkSpec {
  import spark.implicits._

  // two clusters, shared filler "the", distinguishing "cats"/"dogs"
  private val docs = Seq(
    (0, "the cats cats purr"), (0, "the cats sleep"),
    (1, "the dogs bark"), (1, "the dogs dogs run")
  ).toDF("cl", "text")

  private def label(k: Int) =
    ClusterTerms.label(docs, "cl", "text", k)
      .select("cl", "rank", "term", "score")
      .as[(Int, Int, String, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

  describe("ClusterTerms.label") {
    it("puts each cluster's distinguishing term first") {
      val top = label(1)
      top.map(r => (r._1, r._3)) shouldBe Seq((0, "cats"), (1, "dogs"))
      all(top.map(_._4)) should be > 0.0
    }
    it("scores corpus-wide filler exactly 0 (ln(k/k))") {
      val r = label(10)
      r.filter(_._3 == "the").map(_._4) shouldBe Seq(0.0, 0.0)
    }
    it("caps at topK with contiguous per-cluster ranks") {
      val r = label(2)
      r.groupBy(_._1).values.foreach(c => c.map(_._2) shouldBe Seq(1, 2))
    }
  }
}

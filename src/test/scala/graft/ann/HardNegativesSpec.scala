package graft.ann

import graft.SparkSpec

/** Hard-negative mining contract (Ann.hardNegatives): near-dups
  * (cosine ≥ dupTau) and self never appear, survivors rank by cosine
  * descending with id tiebreak, k caps the list.
  */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // anchor 1 along e1; 2 = scaled copy (cos 1 — a near-dup);
  // 3/4/5 at decreasing similarity; 6 orthogonal
  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f)),
    (2L, Seq(2.0f, 0.0f)),   // cos = 1 with anchor → excluded
    (3L, Seq(1.0f, 0.3f)),   // cos ≈ 0.958 → still ≥ 0.95, excluded
    (4L, Seq(1.0f, 0.6f)),   // cos ≈ 0.857 → hardest negative
    (5L, Seq(1.0f, 1.0f)),   // cos ≈ 0.707
    (6L, Seq(0.0f, 1.0f))    // cos = 0
  ).toDF("id", "v")

  private def mine(k: Int) =
    Ann.hardNegatives(vecs, vecs.filter($"id" === 1L), "id", "v", k)
      .select("query_id", "neighbor_id", "rk")
      .as[(Long, Long, Int)].collect().sortBy(_._3).toSeq

  describe("Ann.hardNegatives") {
    it("excludes self and everything at or above the dup threshold") {
      mine(k = 10).map(_._2) shouldBe Seq(4L, 5L, 6L)
    }
    it("caps at k in similarity order") {
      mine(k = 2).map(_._2) shouldBe Seq(4L, 5L)
    }
  }
}

package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SemDeDup contract (Dedup.semantic): within-cluster cosine ≥ τ
  * groups keep exactly their min id; the prune is CLUSTER-scoped
  * (cos ≥ τ across a cluster boundary drops nothing — the paper's
  * documented approximation); the split-capped bucket path returns
  * the same verdicts as the uncapped join.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two L2 cells on the SAME ray: [1,0] and [3,0] — colinear vectors
  // (cosine exactly 1) can still land in different cells
  private val cents = Seq(Seq(1.0, 0.0), Seq(3.0, 0.0))

  private def corpus = Seq(
    (1L, Seq(1.00f, 0.00f)), // cell 0, ε-ball A (min id — survivor)
    (2L, Seq(1.01f, 0.00f)), // cell 0, ε-ball A (dropped)
    (3L, Seq(0.99f, 0.01f)), // cell 0, ε-ball A (dropped)
    (4L, Seq(0.00f, 1.00f)), // cell 0, orthogonal singleton (kept)
    (5L, Seq(2.90f, 0.00f)), // cell 1: cos=1 with ids 1-3, other cell
    (6L, Seq(2.95f, 0.00f))  // cell 1, ε-ball with 5 (dropped)
  ).toDF("id", "v")

  private def verdicts(maxBucket: Int = 200) =
    Dedup.semantic(corpus, "id", "v", cents, tau = 0.95, maxBucket = maxBucket)
      .select("doc_id", "cl", "kept").as[(Long, Int, Boolean)]
      .collect().sortBy(_._1).toSeq

  describe("Dedup.semantic") {
    it("keeps the min id of each within-cluster ε-ball, drops the rest") {
      verdicts() shouldBe Seq(
        (1L, 0, true), (2L, 0, false), (3L, 0, false),
        (4L, 0, true), (5L, 1, true), (6L, 1, false))
    }
    it("never prunes across a cluster boundary (cos=1 across cells)") {
      // ids 5/6 are colinear with 1-3 (cosine exactly 1) but live in
      // cell 1: id 5 survives as its own cell's min, proving the
      // candidate join is keyed on cl — not a global cosine sweep
      verdicts().filter(_._2 == 1).map(v => (v._1, v._3)) shouldBe
        Seq((5L, true), (6L, false))
    }
    it("split-capped buckets (maxBucket=2) return identical verdicts") {
      verdicts(maxBucket = 2) shouldBe verdicts(maxBucket = Int.MaxValue)
    }
    it("emits every input exactly once") {
      verdicts().map(_._1) shouldBe Seq(1L, 2L, 3L, 4L, 5L, 6L)
    }
    it("probe2 closes the cell-boundary recall hole (colinear pair caught)") {
      // the 1-probe contract lets id 5 survive as cell 1's min even
      // though it is colinear with id 1 (previous test); with the
      // second-nearest probe the straddling pairs meet and only the
      // global min id of the ray survives
      val got = Dedup.semantic(corpus, "id", "v", cents, tau = 0.95,
          probe2 = true)
        .select("doc_id", "cl", "kept").as[(Long, Int, Boolean)]
        .collect().sortBy(_._1).toSeq
      got shouldBe Seq(
        (1L, 0, true), (2L, 0, false), (3L, 0, false),
        (4L, 0, true), (5L, 1, false), (6L, 1, false))
      // primary cluster assignment is unchanged by probing
      got.map(v => (v._1, v._2)) shouldBe verdicts().map(v => (v._1, v._2))
    }
    it("probe2 with a single centroid degenerates to 1-probe") {
      val one = Seq(Seq(1.0, 0.0))
      Dedup.semantic(corpus, "id", "v", one, tau = 0.95, probe2 = true)
        .select("doc_id", "kept").as[(Long, Boolean)]
        .collect().sortBy(_._1).toSeq shouldBe
        Dedup.semantic(corpus, "id", "v", one, tau = 0.95)
          .select("doc_id", "kept").as[(Long, Boolean)]
          .collect().sortBy(_._1).toSeq
    }
  }
}

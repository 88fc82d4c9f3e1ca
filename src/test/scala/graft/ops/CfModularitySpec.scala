package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CfModularitySpec extends SparkSpec {
  import spark.implicits._

  describe("ItemCf.topNeighbors") {
    it("ranks the perfectly co-occurring item first") {
      // items 1,2 always together; item 3 with 1 only half the time
      val log = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
        (3L, 1L), (3L, 2L), (4L, 1L), (4L, 3L)).toDF("u", "i")
      val out = ItemCf.topNeighbors(log, "u", "i", k = 2)
        .filter($"item" === 1L).collect()
      out.head.getAs[Long]("neighbor") shouldBe 2L
      out.head.getAs[Double]("sim") shouldBe
        3.0 / math.sqrt(4.0 * 3.0) +- 1e-9
    }
    it("dedupes repeat interactions before counting") {
      val log = Seq((1L, 1L), (1L, 1L), (1L, 2L)).toDF("u", "i")
      ItemCf.topNeighbors(log, "u", "i", k = 1)
        .filter($"item" === 1L).collect()
        .head.getAs[Double]("sim") shouldBe 1.0
    }
    it("caps degenerate user degrees deterministically") {
      // one bot touching 10 items with cap 3 → only items 1..3 pair
      val log = (1L to 10L).map(i => (1L, i)).toDF("u", "i")
      val out = ItemCf.topNeighbors(log, "u", "i", k = 9, maxDegree = 3)
      out.agg(max("item"), max("neighbor")).collect().head
        .toSeq shouldBe Seq(3L, 3L)
    }
  }

  describe("Modularity.census") {
    it("scores two planted cliques near the 2-community optimum") {
      // two triangles joined by one bridge edge
      val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
        (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
      val out = Modularity.census(edges, "src", "dst", iters = 3)
        .collect()
      val q = out.map(_.getAs[Double]("q_term")).sum
      // the planted partition scores Q ≈ 0.357 (Newman's two-clique
      // example); anything ≥ 0.3 means the communities were found
      q should be > 0.3
      out.map(_.getAs[Long]("n_nodes")).sum shouldBe 6L
    }
  }

  describe("dedup.LshAdvisor.expectedRecall") {
    import graft.dedup.LshAdvisor
    it("more bands at fixed hash budget raise recall at J=0.7") {
      val pairs = Seq.fill(100)(0.7).toDF("j")
      val out = LshAdvisor.expectedRecall(pairs, "j",
        Seq((4, 4), (2, 8), (16, 1)))
        .collect().map(r => (r.getAs[Long]("bands"),
          r.getAs[Double]("expected_recall"))).toMap
      // 1-(1-.7^4)^4 ≈ .667; 1-(1-.7^8)^2 ≈ .109; 1-(1-.7)^16 ≈ 1.0
      out(4L) shouldBe 0.667 +- 0.01
      out(2L) shouldBe 0.109 +- 0.01
      out(16L) shouldBe 1.0 +- 0.001
    }
  }

  describe("quality.SnapshotContract.audit") {
    import graft.quality.SnapshotContract
    it("passes a stable batch and fails a halved one") {
      val a = (1 to 100).map(i => (i.toLong, 10.0, "x"))
        .toDF("k", "v", "cat")
      val ok = SnapshotContract.audit(a, a, "k", "v", "cat", "x")
        .collect()
      ok.forall(_.getAs[Boolean]("ok")) shouldBe true
      val b = (1 to 20).map(i => (i.toLong, 10.0, "x"))
        .toDF("k", "v", "cat")
      val bad = SnapshotContract.audit(a, b, "k", "v", "cat", "x")
        .collect().map(r => r.getAs[String]("check_name") ->
          r.getAs[Boolean]("ok")).toMap
      bad("row_ratio") shouldBe false
      bad("key_ratio") shouldBe false
      bad("mean_drift") shouldBe true // same mean
    }
  }
}

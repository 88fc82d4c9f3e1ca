package graft.ops

import graft.SparkSpec

class IdentityStitchSpec extends SparkSpec {
  import spark.implicits._

  describe("IdentityStitch") {
    it("merges users through a shared device, transitively") {
      // u1-d1, u2-d1 (shared device), u2-d2, u3-d2 → one cluster of
      // {u1,u2,u3} × {d1,d2}; u9-d9 stays its own pair
      val sight = Seq((1L, 1L), (2L, 1L), (2L, 2L), (3L, 2L),
        (9L, 9L)).toDF("u", "d")
      val res = IdentityStitch.resolve(sight, "u", "d")
      val byCluster = res.collect()
        .groupBy(_.getAs[Long]("cluster_id"))
        .values.map(_.length).toSeq.sorted
      byCluster shouldBe Seq(2, 5)
    }
    it("census reports (n_users, n_devices) shapes, not members") {
      val sight = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("u", "d")
      val out = IdentityStitch.census(sight, "u", "d").collect()
        .map(r => (r.getAs[Long]("n_users"), r.getAs[Long]("n_devices"),
          r.getAs[Long]("n_clusters"))).toSet
      out shouldBe Set((2L, 1L, 1L), (1L, 1L, 1L))
    }
    it("keeps user and device id spaces collision-free by parity") {
      // user 5 and device 5 are DIFFERENT nodes
      val sight = Seq((5L, 5L)).toDF("u", "d")
      IdentityStitch.resolve(sight, "u", "d").count() shouldBe 2L
    }
  }

  describe("quality.Did.estimate") {
    it("recovers a hand-computed effect and cancels baselines") {
      import org.apache.spark.sql.functions._
      // ctrl: pre 10, post 12 (+2 time shock)
      // treat: pre 20, post 25 (+2 shock + 3 effect)
      val rows = Seq(
        ("g", false, false, 10.0), ("g", false, true, 12.0),
        ("g", true, false, 20.0), ("g", true, true, 25.0))
      val df = rows.toDF("g", "t", "p", "y")
      val r = graft.quality.Did.estimate(df, "g", "t", "p", "y")
        .collect().head
      r.getAs[Double]("did") shouldBe 3.0
    }
    it("nulls the DiD when a cell is empty") {
      val df = Seq(("g", true, true, 1.0), ("g", false, false, 2.0))
        .toDF("g", "t", "p", "y")
      val r = graft.quality.Did.estimate(df, "g", "t", "p", "y")
        .collect().head
      r.isNullAt(r.fieldIndex("did")) shouldBe true
    }
  }
}

package graft.ops

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class LabelPropSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  describe("LabelProp") {
    it("disjoint cliques each converge to their min member's label") {
      val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
        (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
      val labels = LabelProp.run(edges, "src", "dst", iters = 3)
      val census = LabelProp.census(labels).orderBy("label")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      census shouldBe Array((1L, 3L, 1L), (10L, 3L, 10L))
    }

    it("labels never cross connected components") {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
        (100L, 101L), (101L, 102L)).toDF("src", "dst")
      val labels = LabelProp.run(edges, "src", "dst", iters = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val (small, big) = labels.partition(_._1 < 100L)
      all(small.map(_._2)) should be < 100L
      all(big.map(_._2)) should be >= 100L
    }

    it("drops self-loops and duplicate/reversed edges") {
      // triangle {1,2,3} plus a self-loop and duplicated/reversed
      // edges — the census must match the clean triangle's
      val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L),
        (2L, 3L), (1L, 3L)).toDF("src", "dst")
      val census = LabelProp.census(
          LabelProp.run(edges, "src", "dst", iters = 3))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      census shouldBe Array((1L, 3L, 1L))
    }

    it("is deterministic under different partitionings") {
      val base = (1 to 60).flatMap { i =>
        val cl = (i - 1) / 20 * 20 + 1
        Seq((cl.toLong, i.toLong))
      }
      val a = LabelProp.run(base.toDF("src", "dst").repartition(2),
        "src", "dst", 3).collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
      val b = LabelProp.run(base.toDF("src", "dst").repartition(13),
        "src", "dst", 3).collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
      a shouldBe b
    }
  }
}

package graft.ops

import graft.SparkSpec

/** Exact triangle counting via degree-ordered orientation (q149). */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(String, String)]): (Long, Long, Long) = {
    val r = Triangles.census(edges.toDF("src", "dst"), "src", "dst").head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  it("counts each triangle exactly once, whatever the edge directions") {
    // triangle a-b-c given with mixed directions + a dup + a self loop
    count(Seq(
      "a" -> "b", "c" -> "b", "a" -> "c",
      "b" -> "a" /* reverse dup */, "a" -> "a" /* self loop */,
      "c" -> "d")) shouldBe ((4L, 4L, 1L))
  }

  it("K4 has 4 triangles") {
    val nodes = Seq("a", "b", "c", "d")
    val k4 = for { x <- nodes; y <- nodes if x < y } yield x -> y
    count(k4) shouldBe ((4L, 6L, 4L))
  }

  it("a triangle-free bipartite graph counts zero") {
    count(Seq("l1" -> "r1", "l1" -> "r2", "l2" -> "r1", "l2" -> "r2")
      ) shouldBe ((4L, 4L, 0L))
  }

  it("two triangles sharing an edge count as two") {
    count(Seq("a" -> "b", "b" -> "c", "a" -> "c", "b" -> "d", "a" -> "d")
      ) shouldBe ((4L, 5L, 2L))
  }
}

package graft.ops

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  // triangle {a,b,c} with a pendant chain c-d-e
  private def chainGraph = Seq(("a", "b"), ("b", "c"), ("c", "a"),
    ("c", "d"), ("d", "e")).toDF("src", "dst")

  describe("KCore.run") {
    it("keeps the triangle and peels the pendant chain at k=2") {
      val r = KCore.run(chainGraph, "src", "dst", 2)
        .orderBy("node").collect()
      r.map(_.getString(0)).toSeq shouldBe Seq("a", "b", "c")
      r.map(_.getAs[Long]("core_degree")).toSeq shouldBe Seq(2L, 2L, 2L)
    }

    it("cascades: removing one node can peel its neighbors") {
      // path a-b-c-d: every node peels at k=2 (ends first, then all)
      val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
      KCore.run(path, "src", "dst", 2).count() shouldBe 0L
    }

    it("treats edges as undirected and collapses duplicates/self-loops") {
      val noisy = chainGraph
        .union(Seq(("b", "a"), ("a", "a"), ("c", "a")).toDF("src", "dst"))
      val r = KCore.run(noisy, "src", "dst", 2).orderBy("node").collect()
      r.map(_.getString(0)).toSeq shouldBe Seq("a", "b", "c")
    }

    it("k=1 keeps every non-isolated node") {
      KCore.run(chainGraph, "src", "dst", 1).count() shouldBe 5L
    }
  }

  describe("KCore.sql mirror") {
    it("the unrolled SQL peel matches run() on the same graph") {
      chainGraph.createOrReplaceTempView("kc_edges")
      val sql = KCore.sql("SELECT src, dst FROM kc_edges", 2, 4)
        // Spark SQL accepts the generated DuckDB dialect here (no
        // engine-specific syntax in the peel)
      val viaSql = spark.sql(sql).orderBy("node").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val viaRun = KCore.run(chainGraph, "src", "dst", 2)
        .orderBy("node").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      viaSql shouldBe viaRun
    }
  }
}

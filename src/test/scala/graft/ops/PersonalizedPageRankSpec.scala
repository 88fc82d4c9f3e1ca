package graft.ops

import graft.SparkSpec

class PersonalizedPageRankSpec extends SparkSpec {
  import spark.implicits._

  // a -> b -> c, and an island x -> y unreachable from the seed
  private def edges = Seq(("a", "b"), ("b", "c"), ("x", "y"))
    .toDF("src", "dst")

  describe("PageRank.runPersonalized") {
    it("gives teleport mass to seeds only; unreachable nodes rank 0") {
      val out = PageRank.runPersonalized(edges, "src", "dst",
          Seq("a").toDF("node"), iters = 3, scale = 1000000L)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      out("a") should be > 0L // teleport keeps the seed alive
      out("b") should be > 0L // one hop from seed
      out("c") should be > 0L // two hops
      out("x") shouldBe 0L // no seed mass ever reaches the island
      out("y") shouldBe 0L
      out("a") should be > out("c") // authority decays with distance
    }
    it("matches the generated SQL oracle on the same graph") {
      edges.createOrReplaceTempView("ppr_edges")
      val sql = PageRank.personalizedSql(
        "SELECT src, dst FROM ppr_edges",
        "SELECT 'a' AS node", iters = 3)
      // Spark SQL accepts the DuckDB text modulo `//` -> `div`
      val viaSql = spark.sql(sql.replace("//", "div")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val viaOp = PageRank.runPersonalized(edges, "src", "dst",
          Seq("a").toDF("node"), iters = 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      viaSql shouldBe viaOp
    }
    it("seed mass splits over the DISTINCT seed count") {
      val one = PageRank.runPersonalized(edges, "src", "dst",
        Seq("a", "a").toDF("node"), iters = 1, scale = 1000000L)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val two = PageRank.runPersonalized(edges, "src", "dst",
        Seq("a", "x").toDF("node"), iters = 1, scale = 1000000L)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      one("a") shouldBe 150000L // 0.15 * scale / 1 seed
      two("a") shouldBe 75000L // 0.15 * scale / 2 seeds
    }
  }
}

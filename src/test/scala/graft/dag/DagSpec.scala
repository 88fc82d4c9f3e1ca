package graft.dag

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DagSpec extends SparkSpec {

  private def m(name: String, deps: String*): Dag.Model =
    Dag.Model(name, deps, b => deps.map(b).reduceOption(_ unionByName _)
      .getOrElse(spark.range(3).toDF("id")))

  describe("topoSort") {
    it("orders dependencies before dependents, deterministically") {
      val order = Dag.topoSort(Seq(m("c", "a", "b"), m("b", "a"), m("a")))
        .map(_.name)
      order shouldBe Seq("a", "b", "c")
    }
    it("detects cycles and names the participants") {
      val e = intercept[Dag.CycleError] {
        Dag.topoSort(Seq(m("a", "b"), m("b", "a"), m("ok")))
      }
      e.getMessage should include("a, b")
    }
    it("rejects unknown dependencies") {
      an[IllegalArgumentException] should be thrownBy
        Dag.topoSort(Seq(m("a", "ghost")))
    }
  }

  describe("runMaterialized") {
    it("persists table models and merges incremental models across runs") {
      val wh = "target/scratch/dag-spec-wh"
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      import spark.implicits._

      def models(lo: Long, hi: Long) = Seq(
        Dag.Model("src", Nil, _ =>
          spark.range(lo, hi).toDF("id")
            .withColumn("k", col("id") % 3)
            .withColumn("v", col("id") * 10)),
        Dag.Model("latest", Seq("src"), b => {
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy("k").orderBy(col("id").desc)
          b("src").withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).drop("rn")
        }, Dag.Incremental(Seq("k"))),
        Dag.Model("stats", Seq("src"), b =>
          b("src").agg(count(lit(1)).as("n")), Dag.Table))

      Dag.runMaterialized(spark, models(0, 5), wh)
      val out = Dag.runMaterialized(spark, models(5, 8), wh)

      // run 2 saw ids 5..7 → k=2→id7? latest per k after merge:
      // run1 latest: k0→id3(30), k1→id4(40), k2→id2(20)
      // run2 batch:  k0→id6, k1→id7, k2→id5 — all three keys replaced
      val latest = out("latest").select("k", "id").as[(Long, Long)]
        .collect().toMap
      latest shouldBe Map(0L -> 6L, 1L -> 7L, 2L -> 5L)
      // table model persisted: run 2 overwrote with its own count
      out("stats").head().getLong(0) shouldBe 3
      spark.read.parquet(s"$wh/stats").head().getLong(0) shouldBe 3
    }
  }
}

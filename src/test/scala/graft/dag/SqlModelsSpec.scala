package graft.dag

import org.apache.spark.sql.functions._
import graft.SparkSpec
import SqlModels.SqlModel

class SqlModelsSpec extends SparkSpec {

  describe("ref()/source() extraction + compile") {
    it("extracts distinct refs and sources, with or without Jinja braces") {
      val sql = """SELECT * FROM {{ ref('a') }} JOIN ref('b') USING (k)
                  |JOIN {{ source('lake', 'orders') }} o USING (k)
                  |WHERE k IN (SELECT k FROM ref('a'))""".stripMargin
      SqlModels.refs(sql) shouldBe Seq("a", "b")
      SqlModels.sources(sql) shouldBe Seq(("lake", "orders"))
    }
    it("compile resolves every call to a relation name") {
      val compiled = SqlModels.compile(
        "SELECT * FROM {{ ref('m1') }}, source('s', 't')")
      compiled shouldBe "SELECT * FROM graft_model_m1, graft_src_s_t"
    }
  }

  describe("execution through Dag") {
    import spark.implicits._

    it("runs a 3-model chain against a source with auto-extracted deps") {
      val src = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
      val out = SqlModels.run(spark, Seq(
        // authored out of topo order on purpose — refs drive the sort
        SqlModel("sums", "SELECT k, sum(v) AS s FROM {{ ref('stg') }} GROUP BY k"),
        SqlModel("stg", "SELECT k, v FROM {{ source('lake', 'kv') }} WHERE v > 4"),
        SqlModel("top", "SELECT k, s FROM {{ ref('sums') }} WHERE s >= 5")),
        (_, _) => src)
      out("top").orderBy("k").as[(Int, Long)].collect() shouldBe
        Array((1, 30L), (2, 5L))
    }

    it("a cycle in ref()s raises Dag.CycleError") {
      a[Dag.CycleError] should be thrownBy
        SqlModels.run(spark, Seq(
          SqlModel("x", "SELECT 1 FROM ref('y')"),
          SqlModel("y", "SELECT 1 FROM ref('x')")), (_, _) => spark.range(1).toDF())
    }

    it("an unknown ref fails naming the missing model") {
      val e = the[IllegalArgumentException] thrownBy
        SqlModels.run(spark, Seq(
          SqlModel("x", "SELECT 1 AS c FROM ref('nope')")), (_, _) => spark.range(1).toDF())
      e.getMessage should include("nope")
    }

    it("ephemeral models inline into ONE plan — filters push through model boundaries") {
      val src = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      src.write.mode("overwrite").parquet("target/scratch/sqlmodels_src")
      val out = SqlModels.run(spark, Seq(
        SqlModel("stg", "SELECT k, v FROM {{ source('lake', 'src') }}"),
        SqlModel("narrow", "SELECT k FROM {{ ref('stg') }} WHERE k = 7")),
        (_, _) => spark.read.parquet("target/scratch/sqlmodels_src"))
      // the k=7 filter must reach the parquet scan through both
      // model boundaries (dbt-ephemeral semantics via view inlining)
      val physical = out("narrow").queryExecution.executedPlan.toString
      physical should include("PushedFilters: [IsNotNull(k), EqualTo(k,7)]")
      out("narrow").count() shouldBe 1L
    }

    it("table deps resolve to the POST-write relation under runMaterialized") {
      val wh = "target/scratch/sqlmodels_wh"
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      val src = Seq((1, 2), (3, 4)).toDF("k", "v")
      val out = SqlModels.runMaterialized(spark, Seq(
        SqlModel("base", "SELECT k, v FROM {{ source('lake', 'kv') }}", Dag.Table),
        SqlModel("reader", "SELECT sum(k) AS sk FROM {{ ref('base') }}")),
        wh, (_, _) => src)
      // downstream read the persisted parquet, not the source plan
      val physical = out("reader").queryExecution.executedPlan.toString
      physical should include("sqlmodels_wh")
      out("reader").as[Long].head() shouldBe 4L
    }
  }
}

package graft.dag

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.quality.Checks

/** Schema-YAML metadata: emit → parse round-trip fidelity, dbt
  * document shape, and the tests-from-yml execution path.
  */
class ModelYamlSpec extends SparkSpec {
  import spark.implicits._
  import ModelYaml._

  private val doc = ModelDoc("cust_totals",
    description = Some("per-customer rollup"),
    config = Map("materialized" -> "incremental", "unique_key" -> "c_id"),
    columns = Seq(
      ColumnDoc("c_id", "bigint", tests = Seq(NotNullT, UniqueT)),
      ColumnDoc("segment", "string", description = Some("market segment"),
        tests = Seq(AcceptedValuesT(Seq("A", "B")))),
      ColumnDoc("region_id", "bigint",
        tests = Seq(RelationshipsT("source('lake', 'region')", "r_id")))))

  describe("writeModelYml / parseModelYml") {
    it("round-trips the full document including every test form") {
      val dir = Files.createTempDirectory("yml").toString
      val path = ModelYaml.writeModelYml(dir, "staging", doc)
      path.toString should endWith("models/staging/cust_totals.yml")
      val text = Files.readString(path)
      // dbt document shape: version 2, block style
      text should startWith("version: 2")
      text should include("not_null")
      text should include("accepted_values")
      ModelYaml.parseModelYml(text) shouldBe Seq(doc)
    }

    it("rejects a non-version-2 document") {
      an[IllegalArgumentException] should be thrownBy
        ModelYaml.parseModelYml("version: 1\nmodels: []")
    }
  }

  describe("writeSourcesYml / parseSourcesYml") {
    it("round-trips tables and freshness thresholds") {
      val dir = Files.createTempDirectory("yml").toString
      val src = SourceDoc("lake", "main",
        tables = Seq(
          SourceTableDoc("orders", loadedAtField = Some("o_orderdate")),
          SourceTableDoc("customer", description = Some("dim"))),
        freshness = Map("warn_after_seconds" -> 3600L,
          "error_after_seconds" -> 86400L))
      val path = ModelYaml.writeSourcesYml(dir, src)
      ModelYaml.parseSourcesYml(Files.readString(path)) shouldBe Seq(src)
    }
  }

  describe("testsConfig") {
    it("lowers parsed tests onto Checks and counts real violations") {
      val df = Seq(
        (1L, "A", 10L), (2L, "B", 10L), (2L, "C", 99L))
        .toDF("c_id", "segment", "region_id")
      val region = Seq((10L, "r1")).toDF("r_id", "name")
      val cfg = ModelYaml.testsConfig(doc, to => {
        to shouldBe "source('lake', 'region')"
        region
      })
      val res = Checks.run(df, cfg)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      res(("not_null", "c_id")) shouldBe 0
      res(("unique", "c_id")) shouldBe 1 // value 2 appears twice
      res(("accepted_values", "segment")) shouldBe 1 // "C"
      res(("relationships", "region_id")) shouldBe 1 // 99 has no parent
    }
  }
}

package graft.dag

import graft.SparkSpec
import org.apache.spark.sql.types._

class LineageSpec extends SparkSpec {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_totalprice", DoubleType)))
  private val custSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType)))
  private val schemas = Map(
    ("main", "orders") -> ordersSchema,
    ("main", "customer") -> custSchema)

  private def edges(models: SqlModels.SqlModel*): Set[(String, String, String, String)] =
    Lineage.columnLineage(spark, models.toSeq, schemas)
      .map(e => (e.model, e.column, e.srcTable, e.srcColumn)).toSet

  describe("Lineage.columnLineage") {
    it("maps simple aliases to their source columns") {
      edges(SqlModels.SqlModel("m",
        "SELECT o_orderkey AS k, o_totalprice FROM source('main','orders')")) shouldBe
        Set(("m", "k", "main.orders", "o_orderkey"),
          ("m", "o_totalprice", "main.orders", "o_totalprice"))
    }

    it("chases lineage through ref() hops") {
      edges(
        SqlModels.SqlModel("a",
          "SELECT o_custkey AS ck, o_totalprice AS p FROM source('main','orders')"),
        SqlModels.SqlModel("b",
          "SELECT ck, p * 2 AS dbl FROM ref('a')")) should contain allOf(
        ("b", "ck", "main.orders", "o_custkey"),
        ("b", "dbl", "main.orders", "o_totalprice"))
    }

    it("count(*) has no lineage; aggregate args keep theirs") {
      val got = edges(SqlModels.SqlModel("m",
        "SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS s " +
          "FROM source('main','orders') GROUP BY o_custkey"))
      got shouldBe Set(
        ("m", "o_custkey", "main.orders", "o_custkey"),
        ("m", "s", "main.orders", "o_totalprice"))
    }

    it("CASE folds every branch's references") {
      val got = edges(SqlModels.SqlModel("m",
        "SELECT CASE WHEN o_totalprice > 10 THEN o_orderkey ELSE o_custkey " +
          "END AS pick FROM source('main','orders')"))
      got shouldBe Set(
        ("m", "pick", "main.orders", "o_totalprice"),
        ("m", "pick", "main.orders", "o_orderkey"),
        ("m", "pick", "main.orders", "o_custkey"))
    }

    it("UNION merges lineage by position") {
      val got = edges(SqlModels.SqlModel("m",
        "SELECT o_orderkey AS id FROM source('main','orders') " +
          "UNION ALL SELECT c_custkey AS id FROM source('main','customer')"))
      got shouldBe Set(
        ("m", "id", "main.orders", "o_orderkey"),
        ("m", "id", "main.customer", "c_custkey"))
    }

    it("window expressions carry their argument lineage") {
      val got = edges(SqlModels.SqlModel("m",
        "SELECT o_orderkey, sum(o_totalprice) OVER (PARTITION BY o_custkey) " +
          "AS w FROM source('main','orders')"))
      got should contain(("m", "w", "main.orders", "o_totalprice"))
    }

    it("WHERE-only columns do not appear (projection lineage)") {
      val got = edges(SqlModels.SqlModel("m",
        "SELECT o_orderkey FROM source('main','orders') WHERE o_totalprice > 5"))
      got shouldBe Set(("m", "o_orderkey", "main.orders", "o_orderkey"))
    }

    it("rejects models passed out of dependency order") {
      an[IllegalArgumentException] should be thrownBy edges(
        SqlModels.SqlModel("b", "SELECT * FROM ref('a')"),
        SqlModels.SqlModel("a", "SELECT 1 AS one"))
    }
  }
}

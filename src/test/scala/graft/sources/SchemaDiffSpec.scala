package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SchemaDiffSpec extends AnyFunSpec with Matchers with SparkSpec {

  private val v1 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("tag", StringType)))

  private val v2 = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("name", StringType),
    StructField("score", IntegerType),
    StructField("added_col", DateType)))

  describe("SchemaDiff.diff") {
    it("classifies every change kind, type outranking nullability") {
      val rows = SchemaDiff.diff(spark, v1, v2)
        .collect().map(r => (r.getString(0), r.getString(3))).toMap
      rows shouldBe Map("id" -> "nullability_changed",
        "score" -> "type_changed", "tag" -> "removed",
        "added_col" -> "added")
    }

    it("includeUnchanged surfaces stable columns too") {
      val rows = SchemaDiff.diff(spark, v1, v2,
          includeUnchanged = true)
        .collect().map(r => (r.getString(0), r.getString(3))).toMap
      rows("name") shouldBe "unchanged"
      rows.size shouldBe 5
    }

    it("identical schemas diff to empty") {
      SchemaDiff.diff(spark, v1, v1).count() shouldBe 0
    }
  }
}

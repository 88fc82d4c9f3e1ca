package graft.quality

import graft.SparkSpec

/** Dataset-card semantics + inventory contract (q158). */
class DatasetCardSpec extends SparkSpec {
  import spark.implicits._

  it("the column inventory matches the driver corpus exactly") {
    DatasetCard.TableColumns.foreach { case (name, cols) =>
      val actual = graft.sources.Tables
        .load(spark, "/root/testdata/sf0.001", name).columns.toSeq
      actual shouldBe cols
    }
  }

  it("counts rows, columns, and null cells in one pass per table") {
    val df = Seq(
      (Some(1L), Some("x")), (None, Some("y")), (Some(3L), None),
      (None, None)).toDF("r_regionkey", "r_name")
    val card = DatasetCard.cards(Seq("region" -> df)).head()
    card.getString(0) shouldBe "region"
    card.getInt(1) shouldBe 2
    card.getLong(2) shouldBe 4L
    card.getLong(3) shouldBe 4L // 2 + 1 + 1 nulls
  }

  it("generated SQL covers every requested table once") {
    val sql = DatasetCard.sql(Seq("region", "events"))
    sql.split("UNION ALL").length shouldBe 2
    sql should include("'region'")
    sql should include("'events'")
    sql should include("count(props)") // inventory-driven null census
  }
}

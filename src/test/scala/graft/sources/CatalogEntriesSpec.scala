package graft.sources

import graft.SparkSpec

class CatalogEntriesSpec extends SparkSpec {

  describe("CatalogEntries registry") {
    it("upserts (preserving created_at), soft-deletes, and lists live entries newest-first") {
      import spark.implicits._
      val path = "target/scratch/catalog-entries-spec"
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

      val store = new CatalogEntries(spark, path)
      store.upsert("t1", "main", "lake", "source_table", None, 3, nowMs = 100L)
      store.upsert("t2", "main", "lake", "dbt_model", Some("model"), 5, nowMs = 200L)
      // update keeps created_at, bumps updated_at
      store.upsert("t1", "main", "lake", "source_table", Some("desc"), 4, nowMs = 300L)

      val rows = store.list()
        .select("table_name", "description", "n_columns", "created_at_ms", "updated_at_ms")
        .as[(String, Option[String], Int, Long, Long)].collect()
      rows.length shouldBe 2
      rows.head._1 shouldBe "t2" // newest created first
      val t1 = rows.find(_._1 == "t1").get
      t1 shouldBe (("t1", Some("desc"), 4, 100L, 300L))

      store.delete("t2", "main", "lake", nowMs = 400L) shouldBe true
      store.delete("ghost", "main", "lake", nowMs = 400L) shouldBe false
      store.list().count() shouldBe 1
      store.list(Some("dbt_model")).count() shouldBe 0
    }
  }

  describe("Catalog.discoverTables") {
    it("enumerates parquet tables and filters _dlt_ system tables") {
      val names = Catalog.discoverTables(spark, "/root/testdata/sf0.001")
      names should contain allOf ("orders", "lineitem", "documents")
      names.exists(_.startsWith("_dlt_")) shouldBe false
    }
  }
}

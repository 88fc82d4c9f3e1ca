package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  describe("bucketed join co-location") {
    it("joins two tables bucketed on the key with NO shuffle exchange") {
      val dir = "/root/testdata/sf0.001"
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val lineitem = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity")

      // the in-memory catalog forgets tables between JVM runs but the
      // warehouse dir persists — clear both for a reproducible test
      for (t <- Seq("b_orders", "b_lineitem")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
      Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8,
        sortCols = Seq("o_orderkey"))
      Bucketing.writeBucketed(lineitem, "b_lineitem", Seq("l_orderkey"), 8,
        sortCols = Seq("l_orderkey"))

      // hint MERGE so AQE doesn't broadcast the tiny test tables —
      // at real scale SMJ is what the planner picks anyway
      val joined = Bucketing.table(spark, "b_lineitem").hint("MERGE")
        .join(Bucketing.table(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"

      // and the result matches the unbucketed join
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count()
      joined.count() shouldBe expected
    }
  }

  describe("ensureBucketed") {
    it("re-registers surviving bucketed files after catalog metadata is lost") {
      val dir = "/root/testdata/sf0.001"
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey")
      val hconf = spark.sparkContext.hadoopConfiguration
      for (t <- Seq("eb_src", "eb_copy")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
        p.getFileSystem(hconf).delete(p, true)
      }
      // first call writes (no files yet)
      Bucketing.ensureBucketed(spark, orders, "eb_src", Seq("o_orderkey"), 4)
      // simulate a fresh JVM: files exist at the expected location but
      // the in-memory catalog has no entry — copy the data dir to a
      // table name the catalog has never seen
      val src = new org.apache.hadoop.fs.Path("spark-warehouse/eb_src")
      val dst = new org.apache.hadoop.fs.Path("spark-warehouse/eb_copy")
      val fs = src.getFileSystem(hconf)
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, hconf)

      Bucketing.ensureBucketed(spark, orders, "eb_copy", Seq("o_orderkey"), 4)
      // registered as bucketed: a self-join on the bucket key plans
      // without a shuffle exchange, and the data round-trips
      val tbl = Bucketing.table(spark, "eb_copy")
      tbl.count() shouldBe orders.count()
      val joined = tbl.hint("MERGE").join(
        Bucketing.table(spark, "eb_src"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"
    }
  }

  describe("clustered write") {
    it("range-clusters files so a cursor predicate prunes row groups") {
      val dir = "/root/testdata/sf0.001"
      val path = "target/scratch/clustered-orders"
      val orders = Tables.load(spark, dir, "orders")
      Bucketing.writeClustered(orders, path, Seq("o_orderdate"), numFiles = 8)

      val pruned = spark.read.parquet(path)
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      // correctness preserved
      pruned.count() shouldBe orders
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")).count()
      // the bound reaches the scan as a data filter (min/max pruning)
      val scan = pruned.queryExecution.executedPlan.toString
      scan should include("PushedFilters")
      scan should include("o_orderdate")
    }
  }
}

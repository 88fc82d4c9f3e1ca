package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Incremental

class WriterIncrementalSpec extends SparkSpec {

  describe("Writer.merge (logical)") {
    it("replaces destination rows whose PK appears in the batch, keeps batch dups") {
      import spark.implicits._
      val existing = Seq((1L, "old"), (2L, "keep")).toDF("id", "v")
      val batch = Seq((1L, "new"), (1L, "new2"), (3L, "ins")).toDF("id", "v")
      val out = Writer.merge(existing, batch, Seq("id"))
        .as[(Long, String)].collect().sorted
      out shouldBe Array((1L, "new"), (1L, "new2"), (2L, "keep"), (3L, "ins"))
    }
  }

  describe("Writer.write merge disposition") {
    it("stages and swaps without leaving .staging/.old behind") {
      import spark.implicits._
      val path = "target/scratch/writer-spec-table"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)

      Writer.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
        path, "merge", Seq("id"))
      Writer.write(spark, Seq((2L, "B"), (3L, "c")).toDF("id", "v"),
        path, "merge", Seq("id"))

      val out = spark.read.parquet(path).as[(Long, String)].collect().sorted
      out shouldBe Array((1L, "a"), (2L, "B"), (3L, "c"))
      fs.exists(new org.apache.hadoop.fs.Path(path + ".staging")) shouldBe false
      fs.exists(new org.apache.hadoop.fs.Path(path + ".old")) shouldBe false
    }
  }

  describe("Database.loadAll") {
    it("applies per-table dispositions and reports rows loaded") {
      import spark.implicits._
      import graft.sources.Database
      val dest = "target/scratch/database-spec-dest"
      val p = new org.apache.hadoop.fs.Path(dest)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

      val cfg = Map(
        "t_merge" -> Database.TableConfig(disposition = "merge", primaryKey = Seq("id")),
        "t_app" -> Database.TableConfig(disposition = "append"))
      def frames(lo: Long, hi: Long) = Map(
        "t_merge" -> spark.range(lo, hi).toDF("id"),
        "t_app" -> spark.range(lo, hi).toDF("id"))

      val info1 = Database.loadAll(spark, frames(0, 4), dest, cfg)
      info1 shouldBe Map("t_merge" -> 4L, "t_app" -> 4L)
      val info2 = Database.loadAll(spark, frames(2, 6), dest, cfg)
      info2 shouldBe Map("t_merge" -> 6L, "t_app" -> 8L) // merged vs appended
    }
  }

  describe("Incremental ranges") {
    import spark.implicits._
    def df = Seq(1L, 2L, 3L, 4L).toDF("c")

    it("first run is CLOSED on initial_value (dlt fetches the initial row)") {
      Incremental.extract(df, "c", initialValue = Some(2L))
        .as[Long].collect().sorted shouldBe Array(2L, 3L, 4L)
    }
    it("re-runs are OPEN above last_value") {
      Incremental.extract(df, "c", lastValue = Some(2L))
        .as[Long].collect().sorted shouldBe Array(3L, 4L)
    }
    it("state round-trips through the typed parquet store") {
      val sp = "target/scratch/incremental-spec-state"
      Incremental.saveState(df, "c", sp)
      Incremental.loadState(spark, sp).lastValue shouldBe Some(4L)
      Incremental.loadState(spark, sp + "-missing").lastValue shouldBe None
    }
  }

  describe("IncrementalModel.onSchemaChange") {
    import spark.implicits._
    val existing = Seq((1L, 10.0)).toDF("k", "a")
    val batch = Seq((2L, 2.0, "x")).toDF("k", "a", "b")

    it("fail throws on schema drift") {
      an[IncrementalModel.SchemaChanged] should be thrownBy
        IncrementalModel.run(existing, batch, Seq("k"),
          onSchemaChange = IncrementalModel.Fail)
    }
    it("ignore keeps the existing relation's shape") {
      val out = IncrementalModel.run(existing, batch, Seq("k"),
        onSchemaChange = IncrementalModel.Ignore)
      out.columns.toSeq shouldBe Seq("k", "a")
      out.count() shouldBe 2
    }
    it("append_new_columns widens the target") {
      val out = IncrementalModel.run(existing, batch, Seq("k"),
        onSchemaChange = IncrementalModel.AppendNewColumns)
      out.columns.toSet shouldBe Set("k", "a", "b")
      out.filter(col("k") === 1L).head().getAs[String]("b") shouldBe null
    }
  }

  describe("RowFilters null semantics") {
    import RowFilters._
    import spark.implicits._
    val df = Seq(Some(1L), Some(2L), None).toDF("x")

    it("ne treats null as 'different' (reference Python semantics)") {
      RowFilters(df, Seq(RowFilter("x", Ne, 1L))).count() shouldBe 2
    }
    it("not_in passes nulls") {
      RowFilters(df, Seq(RowFilter("x", NotIn, Seq(1L)))).count() shouldBe 2
    }
    it("in drops nulls") {
      RowFilters(df, Seq(RowFilter("x", In, Seq(1L, 2L)))).count() shouldBe 2
    }
  }
}

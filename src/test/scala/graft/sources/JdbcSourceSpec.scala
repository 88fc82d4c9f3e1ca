package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Live JDBC extraction against embedded Derby: write/read
  * round-trip, cursor predicate pushdown into the remote scan,
  * partitioned parallel read, and multi-table extract.
  */
class JdbcSourceSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:target/scratch/jdbc_spec_db;create=true"
  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def fixture(): Unit = {
    if (!JdbcSource.tableExists(url, "ITEMS")) {
      val df = (1L to 100L).map(i => (i, s"item_$i", i * 10.0))
        .toDF("ID", "NAME", "PRICE")
      JdbcSource.writeTable(df, url, "ITEMS")
    }
  }

  describe("JdbcSource.table") {
    it("round-trips rows through the database") {
      fixture()
      val back = JdbcSource.table(spark, url, "ITEMS", options = opts)
      back.count() shouldBe 100
      back.agg(sum("ID")).head().getLong(0) shouldBe 5050
    }

    it("fans a partitioned read out into numPartitions strides") {
      fixture()
      val part = JdbcSource.table(spark, url, "ITEMS",
        JdbcSource.TableConfig(partitionColumn = Some("ID"),
          lowerBound = Some(1L), upperBound = Some(101L), numPartitions = 4),
        options = opts)
      part.rdd.getNumPartitions shouldBe 4
      part.count() shouldBe 100 // strides partition, never filter
    }
  }

  describe("JdbcSource.tableIncremental") {
    it("pushes the cursor bound into the JDBC scan") {
      fixture()
      val inc = JdbcSource.tableIncremental(spark, url, "ITEMS",
        JdbcSource.TableConfig(cursor = Some("ID"), lastValue = Some(90L)),
        options = opts)
      inc.count() shouldBe 10
      // the watermark must reach the remote WHERE clause: the scan
      // node advertises it as a pushed filter, so the database ships
      // only rows above the cursor — O(new data) incremental reads
      val plan = inc.queryExecution.executedPlan.toString
      plan should include("PushedFilters")
      plan should include("GreaterThan(ID,90)")
    }

    it("first run honors initialValue as a closed bound") {
      fixture()
      JdbcSource.tableIncremental(spark, url, "ITEMS",
        JdbcSource.TableConfig(cursor = Some("ID"), initialValue = Some(90L)),
        options = opts).count() shouldBe 11
    }
  }

  describe("cursor state round-trip (dlt pipeline-state loop)") {
    it("run 2 resumes strictly above run 1's persisted watermark") {
      fixture()
      val statePath =
        java.nio.file.Files.createTempDirectory("jdbc_state").toString + "/st"
      // run 1: first 60 ids land; watermark persists
      val run1 = JdbcSource.tableIncremental(spark, url, "ITEMS",
        JdbcSource.TableConfig(cursor = Some("ID")), options = opts)
        .filter(col("ID") <= 60) // simulates the state of the source then
      Incremental.saveState(run1, "ID", statePath)
      // run 2: loads state, extracts strictly above it over JDBC
      val state = Incremental.loadState(spark, statePath)
      state.lastValue shouldBe Some(60L)
      val run2 = JdbcSource.tableIncremental(spark, url, "ITEMS",
        JdbcSource.TableConfig(cursor = Some("ID"),
          lastValue = state.lastValue), options = opts)
      run2.count() shouldBe 40
      run2.agg(min("ID")).head().getLong(0) shouldBe 61
    }
  }

  describe("JdbcSource.database") {
    it("extracts selected tables with per-table configs") {
      fixture()
      if (!JdbcSource.tableExists(url, "TAGS")) {
        JdbcSource.writeTable(Seq((1L, "a"), (2L, "b")).toDF("ID", "TAG"),
          url, "TAGS")
      }
      val frames = JdbcSource.database(spark, url, Seq("ITEMS", "TAGS"),
        perTable = Map("ITEMS" ->
          JdbcSource.TableConfig(cursor = Some("ID"), lastValue = Some(50L))),
        options = opts)
      frames("ITEMS").count() shouldBe 50
      frames("TAGS").count() shouldBe 2
    }
  }
}

package graft.ops

import graft.SparkSpec

class RunLedgerSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): RunLedger = {
    val path = s"target/scratch/ledger_$name"
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    new RunLedger(spark, path)
  }

  describe("RunLedger") {
    it("lifecycle transitions update in place (merge on run_id)") {
      val l = fresh("lifecycle")
      l.record(1L, "p", "pending")
      l.record(1L, "p", "running", startedMs = Some(100L))
      l.record(1L, "p", "success", startedMs = Some(100L),
        finishedMs = Some(200L), rowsLoaded = Some(42L))
      val rows = l.list().select("run_id", "status", "rows_loaded")
        .as[(Long, String, Long)].collect()
      rows shouldBe Array((1L, "success", 42L))
    }
    it("rejects unknown statuses") {
      an[IllegalArgumentException] should be thrownBy
        fresh("bad").record(1L, "p", "exploded")
    }
    it("checkUpstream requires a SUCCESS inside the timeframe") {
      val l = fresh("check")
      l.record(1L, "a", "success", finishedMs = Some(9_000L))
      l.record(2L, "b", "success", finishedMs = Some(1_000L)) // stale
      l.record(3L, "c", "failed", finishedMs = Some(9_500L))  // fresh but failed
      val out = l.checkUpstream(Seq("a", "b", "c", "never_ran"),
          timeframeMs = 5_000L, nowMs = 10_000L)
        .orderBy("target")
        .select("target", "satisfied").as[(String, Boolean)].collect()
      out shouldBe Array(("a", true), ("b", false), ("c", false),
        ("never_ran", false))
    }
    it("list filters by target and status") {
      val l = fresh("filters")
      l.record(1L, "a", "success", finishedMs = Some(1L))
      l.record(2L, "a", "failed", finishedMs = Some(2L))
      l.record(3L, "b", "success", finishedMs = Some(3L))
      l.list(target = Some("a")).count() shouldBe 2
      l.list(status = Some("success")).count() shouldBe 2
      l.list(Some("a"), Some("failed")).count() shouldBe 1
    }
  }
}

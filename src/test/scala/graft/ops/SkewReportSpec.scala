package graft.ops

import graft.SparkSpec

/** SkewReport.topKeys contract: ordering, shares, tiebreak, and the
  * TakeOrdered plan shape (no global sort).
  */
class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  private val rows =
    (Seq.fill(6)(7L) ++ Seq.fill(3)(1L) ++ Seq.fill(3)(2L) ++ Seq(9L))
      .toDF("k")

  describe("SkewReport.topKeys") {
    it("ranks by count desc with key-asc tiebreak and exact shares") {
      val r = SkewReport.topKeys(rows, "k", 3)
        .select("rank", "key", "n_rows", "share", "n_total", "n_distinct")
        .as[(Int, Long, Long, Double, Long, Long)].collect().toSeq
        .sortBy(_._1)
      r shouldBe Seq(
        (1, 7L, 6L, 0.461538462, 13L, 4L),
        (2, 1L, 3L, 0.230769231, 13L, 4L), // ties 1 vs 2 → smaller key
        (3, 2L, 3L, 0.230769231, 13L, 4L))
    }
    it("caps at k and plans the top-k as TakeOrdered, not a sort") {
      val df = SkewReport.topKeys(rows, "k", 2)
      df.count() shouldBe 2L
      val plan = df.queryExecution.executedPlan.toString
      plan should include("TakeOrderedAndProject")
    }
    it("builds without firing a Spark job (lazy broadcast totals)") {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      // wait until the async listener bus goes quiet: no new JobStart
      // for 500ms (straggler events from earlier tests/probes must
      // not be attributed to the build under test)
      def awaitQuiet(): Int = {
        val deadline = System.nanoTime() + 10000000000L
        var last = jobs.get()
        var lastChange = System.nanoTime()
        while (System.nanoTime() - lastChange < 500000000L &&
            System.nanoTime() < deadline) {
          Thread.sleep(20)
          val now = jobs.get()
          if (now != last) { last = now; lastChange = System.nanoTime() }
        }
        last
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        // drain stragglers from earlier tests, THEN calibrate how
        // many jobs the probe action itself costs
        awaitQuiet()
        jobs.set(0)
        spark.range(1).collect()
        val probeCost = awaitQuiet()
        jobs.set(0)
        SkewReport.topKeys(rows, "k", 3)
        // probe again: listener events deliver FIFO, so once the
        // probe's own JobStarts land, any job the build had fired
        // would already be counted — probeCost alone means none
        spark.range(1).collect()
        awaitQuiet() shouldBe probeCost
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    it("returns an empty report on empty input") {
      SkewReport.topKeys(rows.filter("k < 0"), "k", 3).count() shouldBe 0L
    }
  }
}

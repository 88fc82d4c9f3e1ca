package graft.ops

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, WebEntry}

/** Semantics + plan shape for the product-analytics pair (q141/q142):
  * the cohort-retention matrix and the time-RANGE rolling window.
  */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  describe("cohortRetention") {
    // u1 appears weeks 0,1,3; u2 weeks 0,2; u3 week 1 only. A repeat
    // (user, week) observation must not double-count.
    val periods = Seq(
      (1L, 0L), (1L, 1L), (1L, 3L), (1L, 1L),
      (2L, 0L), (2L, 2L),
      (3L, 1L)).toDF("user_id", "wk")

    it("builds the matrix with distinct-user counts per offset") {
      val m = WebEntry.cohortRetention(periods)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      m shouldBe Map(
        (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L, (0L, 3L) -> 1L,
        (1L, 0L) -> 1L)
    }

    it("offset-0 equals cohort size and later offsets never exceed it") {
      val rows = WebEntry.cohortRetention(periods).collect()
      val base = rows.filter(_.getLong(1) == 0L)
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      rows.foreach { r => r.getLong(2) should be <= base(r.getLong(0)) }
    }
  }

  describe("rollingByTime") {
    def ev(rows: (Long, Long, Long, Double)*) =
      rows.toDF("event_id", "user_id", "ms", "value")

    it("frame is [t-window, t] with BOTH ends inclusive, per user") {
      // window=100: at t=150 the event at exactly t=50 is IN frame;
      // at t=151 it has aged out. Ties at the same ms all see each
      // other (RANGE, not ROWS).
      val out = WebEntry.rollingByTime(ev(
          (1L, 7L, 50L, 1.0), (2L, 7L, 150L, 2.0), (3L, 7L, 151L, 4.0),
          (4L, 7L, 151L, 8.0),
          (5L, 9L, 150L, 100.0)), // other user: isolated partition
          windowMs = 100L)
        .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
      out(1L) shouldBe ((1L, 1.0))
      out(2L) shouldBe ((2L, 3.0))          // includes t=50 (inclusive low end)
      out(3L) shouldBe ((3L, 14.0))         // t=50 aged out; tie at 151 included
      out(4L) shouldBe ((3L, 14.0))         // RANGE: tied rows share the frame
      out(5L) shouldBe ((1L, 100.0))        // user 9 unaffected by user 7
    }

    it("plans a keyed window (never a global single-partition frame)") {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def wins(p: SparkPlan): Seq[WindowExec] = p match {
        case a: AdaptiveSparkPlanExec => wins(a.executedPlan)
        case q: QueryStageExec => wins(q.plan)
        case w: WindowExec => w +: w.children.flatMap(wins)
        case other => other.children.flatMap(wins)
      }
      val out = WebEntry.rollingByTime(ev((1L, 1L, 0L, 1.0)), 10L)
      out.collect()
      val ws = wins(out.queryExecution.executedPlan)
      ws should not be empty
      ws.foreach(_.partitionSpec should not be empty)
    }
  }
}

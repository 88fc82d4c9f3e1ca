package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class FunnelGapFillSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  describe("Funnel.stages") {
    val steps = Seq("a", "b", "c").map(s => s -> (col("et") === s))

    def run(rows: Seq[(Long, Long, String)], horizon: Option[Long] = None) =
      Funnel.stages(rows.toDF("k", "ts", "et"), "k", "ts", steps, horizon)
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), Option(r.get(2)), Option(r.get(3)))).toMap

    it("counts only in-order steps") {
      val m = run(Seq(
        (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), // full, span 20
        (2L, 10L, "b"), (2L, 20L, "a"), (2L, 30L, "b"), // a then b: stage 2
        (3L, 10L, "c"), (3L, 20L, "b"), // no a: stage 0
        (4L, 10L, "a"))) // only a: stage 1
      m(1L) shouldBe ((3, Some(10L), Some(30L)))
      m(2L) shouldBe ((2, Some(20L), None))
      m(3L) shouldBe ((0, None, None))
      m(4L) shouldBe ((1, Some(10L), None))
    }

    it("anchors at the FIRST step-1 event and enforces the horizon") {
      // first a at 10; b at 100 is outside horizon 50 → stage stalls
      // at 1 even though a second a at 90 would be in range (strict
      // single-anchor semantics, as documented)
      val m = run(Seq((1L, 10L, "a"), (1L, 90L, "a"), (1L, 100L, "b")),
        horizon = Some(50L))
      m(1L)._1 shouldBe 1
      // within horizon: completes
      val m2 = run(Seq((2L, 10L, "a"), (2L, 40L, "b"), (2L, 60L, "c")),
        horizon = Some(50L))
      m2(2L) shouldBe ((3, Some(10L), Some(60L)))
    }

    it("a same-ts later step counts (ties break on the tiebreak col)") {
      // explicit event_id tiebreak (as q95 passes): the a-before-b
      // resolution is deterministic by construction, not an accident
      // of partition order
      val m = Funnel.stages(
          Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"))
            .toDF("k", "ts", "event_id", "et"),
          "k", "ts", steps, tiebreak = Seq("event_id"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      m(1L) shouldBe 2
    }

    it("plans exactly one hash exchange for the cascade") {
      val df = Funnel.stages(
        Seq((1L, 10L, "a")).toDF("k", "ts", "et"), "k", "ts", steps)
      val plan = df.queryExecution.executedPlan.toString
      "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    }
  }

  describe("GapFill") {
    it("forward-fills gaps per key, leaves leading gaps null") {
      val ev = Seq(
        (1L, "2024-01-01", 10.0), (1L, "2024-01-03", 30.0),
        (2L, "2024-01-02", 5.0))
        .toDF("k", "d", "v")
        .select(col("k"), to_date(col("d")).as("d"), col("v"))
      val out = GapFill.dailyFill(ev, "k", col("d"),
          sum(col("v").cast("decimal(18,6)")).cast("double"))
        .orderBy("k", "day").collect()
      out.length shouldBe 6 // 2 keys x 3 days
      val k1 = out.filter(_.getLong(0) == 1L)
      k1.map(_.getLong(2)).toSeq shouldBe Seq(1L, 0L, 1L)
      k1.map(r => Option(r.get(5))).toSeq shouldBe
        Seq(Some(10.0), Some(10.0), Some(30.0)) // LOCF through the gap
      val k2 = out.filter(_.getLong(0) == 2L)
      k2.map(r => Option(r.get(5))).toSeq shouldBe
        Seq(None, Some(5.0), Some(5.0)) // leading gap stays null
      k2.map(_.getBoolean(4)).toSeq shouldBe Seq(true, false, true)
    }

    it("returns empty on empty input") {
      val ev = Seq.empty[(Long, String, Double)].toDF("k", "d", "v")
        .select(col("k"), to_date(col("d")).as("d"), col("v"))
      GapFill.dailyFill(ev, "k", col("d"), sum("v")).count() shouldBe 0L
    }
  }

  describe("linearFill") {
    def run(rows: Seq[(String, Long, Option[Double])]) =
      GapFill.linearFill(rows.toDF("k", "t", "v"), Seq("k"), "t", "v")
        .orderBy("k", "t").collect()
        .map(r => (r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getBoolean(4)))

    it("interpolates proportionally to the time gap") {
      val out = run(Seq(("k", 0L, Some(10.0)), ("k", 1L, None),
        ("k", 3L, None), ("k", 4L, Some(50.0))))
      out shouldBe Array((0L, Some(10.0), false),
        (1L, Some(20.0), true), (3L, Some(40.0), true),
        (4L, Some(50.0), false))
    }

    it("leading and trailing nulls stay null (no extrapolation)") {
      val out = run(Seq(("k", 0L, None), ("k", 1L, Some(5.0)),
        ("k", 2L, Some(7.0)), ("k", 3L, None)))
      out.head._2 shouldBe None
      out.head._3 shouldBe false
      out.last._2 shouldBe None
    }

    it("keys interpolate independently") {
      val out = GapFill.linearFill(
          Seq(("a", 0L, Some(0.0)), ("a", 2L, Some(2.0)),
            ("b", 1L, None)).toDF("k", "t", "v"),
          Seq("k"), "t", "v")
        .filter(col("k") === "b").collect()
      out.head.isNullAt(3) shouldBe true
    }
  }
}

package graft.ops

import graft.SparkSpec

class SurvivalRfmHoltBfsSpec extends SparkSpec {
  import spark.implicits._

  describe("Survival.kaplanMeier") {
    it("matches the hand-computed product-limit curve with censoring") {
      // group g=0: durations (ev) — 2(1) 3(0) 4(1) 4(1) 5(0)
      // t=2: n=5 d=1 -> S = 4/5 = 0.8
      // t=3: censor only, no step
      // t=4: n=3 d=2 -> S = 0.8 * 1/3 = 0.266667
      val df = Seq((0, 2, 1), (0, 3, 0), (0, 4, 1), (0, 4, 1), (0, 5, 0))
        .toDF("g", "dur", "ev")
      val out = Survival.kaplanMeier(df)
        .select("t", "n_risk", "d_events", "c_censored", "survival")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).sortBy(_._1)
      out.length shouldBe 2
      out(0) shouldBe ((2L, 5L, 1L, 0L, 0.8))
      out(1)._2 shouldBe 3L
      out(1)._3 shouldBe 2L
      out(1)._5 shouldBe (0.8 / 3.0 +- 1e-6)
    }
    it("reports survival 0 (null log) when the last risk set all dies") {
      val df = Seq((0, 1, 1), (0, 2, 1)).toDF("g", "dur", "ev")
      val rows = Survival.kaplanMeier(df)
        .orderBy("t").collect()
      rows(1).isNullAt(rows(1).fieldIndex("log_survival")) shouldBe true
      rows(1).getDouble(rows(1).fieldIndex("survival")) shouldBe 0.0
    }
    it("censored-at-event-time subjects count at risk (tie convention)") {
      // t=1: n=3 (the subject censored AT 1 is at risk), d=1 -> S=2/3
      val df = Seq((0, 1, 1), (0, 1, 0), (0, 2, 0)).toDF("g", "dur", "ev")
      val r = Survival.kaplanMeier(df).collect().head
      r.getLong(r.fieldIndex("n_risk")) shouldBe 3L
      r.getDouble(r.fieldIndex("survival")) shouldBe (2.0 / 3.0 +- 1e-6)
    }
  }

  describe("Ewma.holt") {
    it("tracks a pure ramp with the trend term (EWMA would lag)") {
      // x_t = 100t: after warmup the forecast should be close to the
      // next value, far closer than a trendless EWMA's lag of
      // roughly trend/alpha = 4 steps x 100
      val xs = (0 to 20).map(i => (0, i, 100L * i))
      val df = xs.toDF("g", "t", "x")
      val out = Ewma.holt(df, 1, 4, 1, 10).orderBy("t").collect()
      val last = out.last
      val fc = last.getLong(last.fieldIndex("forecast_fp")) / 1e6
      (2000.0 - fc) should be < 250.0 // trendless EWMA sits ~400 behind
      // trend estimate converging toward 100/step
      val trend = last.getLong(last.fieldIndex("trend_fp")) / 1e6
      trend should be > 50.0
    }
    it("is the documented truncating fixed-point recursion") {
      val df = Seq((0, 0, 8L), (0, 1, 4L), (0, 2, 2L)).toDF("g", "t", "x")
      val out = Ewma.holt(df, 1, 4, 1, 2, scale = 100L)
        .orderBy("t").select("level_fp", "trend_fp").collect()
      // t0: l=800 b=0; t1: l=(400*1+800*3) div 4 = 700,
      //   b=((700-800)*1 + 0*1) div 2 = -50 (truncation toward zero)
      // t2: l=(200 + (700-50)*3) div 4 = (200+1950) div 4 = 537
      //   b=((537-700) - 50) div 2 = -213 div 2 = -106
      out.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
        Seq((800L, 0L), (700L, -50L), (537L, -106L))
    }
  }

  describe("Rfm.segment") {
    it("scores quintiles with inverted recency and names segments") {
      // 10 customers, orders crafted so customer 1 is recent +
      // frequent + big (champion) and customer 10 stale + rare
      val day = 86400000L
      val orders = (1 to 10).flatMap { c =>
        val n = 11 - c // frequency: c1 -> 10 orders, c10 -> 1
        (1 to n).map(i => (c.toLong, (100L - c) * day + i, c match {
          case x if x <= 2 => 100000L // big spenders
          case _ => 1000L * (11 - c)
        }))
      }.toDF("cust", "order_ms", "cents")
      val out = Rfm.segment(orders).collect()
        .map(r => r.getLong(r.fieldIndex("cust")) ->
          r.getString(r.fieldIndex("segment"))).toMap
      out(1L) shouldBe "champion"
      // customer 10: oldest single cheap order -> hibernating
      out(10L) shouldBe "hibernating"
    }
    it("gives tied metric values identical scores in every engine") {
      val orders = (1 to 8).map(c => (c.toLong, 1000L, 500L))
        .toDF("cust", "order_ms", "cents")
      val scores = Rfm.segment(orders).select("r", "f", "m").distinct()
        .collect()
      scores.length shouldBe 1 // all customers identical -> one score row
    }
  }

  describe("Bfs.hops") {
    it("labels minimum hop counts level by level") {
      val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
        ("x", "y")).toDF("src", "dst")
      val out = Bfs.hops(edges, "src", "dst", Seq("a").toDF("node"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toMap
      out shouldBe Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2)
    }
    it("multi-source: nearest seed wins; disconnected stays absent") {
      val edges = Seq(("a", "b"), ("b", "c"), ("x", "y"))
        .toDF("src", "dst")
      val out = Bfs.hops(edges, "src", "dst",
          Seq("a", "x").toDF("node"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toMap
      out shouldBe Map("a" -> 0, "x" -> 0, "b" -> 1, "y" -> 1, "c" -> 2)
    }
    it("oracle unroll matches the Spark fixpoint on the same graph") {
      val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"))
        .toDF("src", "dst")
      edges.createOrReplaceTempView("bfs_edges")
      val sql = Bfs.sql("SELECT src, dst FROM bfs_edges",
        "SELECT 'a' AS node", rounds = 5)
      val viaSql = spark.sql(sql).collect()
        .map(r => (r.getString(0), r.getInt(1))).toMap
      val viaOp = Bfs.hops(edges, "src", "dst", Seq("a").toDF("node"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toMap
      viaSql shouldBe viaOp
    }
  }
}

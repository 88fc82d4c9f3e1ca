package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSeriesStatsSpec extends SparkSpec {
  import spark.implicits._

  describe("Assortativity.degreeCorrelation") {
    it("a star graph is maximally disassortative (r = -1)") {
      val star = (1 to 5).map(i => ("h", s"x$i")).toDF("src", "dst")
      val r = Assortativity.degreeCorrelation(star, "src", "dst")
        .collect().head
      r.getAs[Long]("n_slots") shouldBe 10L
      r.getAs[Double]("r") shouldBe (-1.0 +- 1e-9)
    }

    it("a regular graph has zero degree variance -> null r") {
      // 4-cycle: every degree 2
      val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
        .toDF("src", "dst")
      val r = Assortativity.degreeCorrelation(cyc, "src", "dst")
        .collect().head
      r.isNullAt(r.fieldIndex("r")) shouldBe true
    }

    it("two disconnected hubs of different sizes score negative") {
      val g = ((1 to 4).map(i => ("h1", s"a$i")) ++
        (1 to 2).map(i => ("h2", s"b$i"))).toDF("src", "dst")
      val r = Assortativity.degreeCorrelation(g, "src", "dst")
        .collect().head
      r.getAs[Double]("r") should be < 0.0
    }
  }

  describe("Burstiness.fano") {
    import graft.quality.Burstiness
    it("a metronome scores 0 and a one-day burst scores high") {
      // calendar spine: days 1..10 (from min/max across all ids)
      val metronome = (1L to 10L).map(d => ("m", d))
      val burst = Seq.fill(10)(("b", 5L)) :+ (("b", 1L)) :+ (("b", 10L))
      val df = (metronome ++ burst).toDF("id", "day")
      val r = Burstiness.fano(df, minEvents = 1, tau = 2.0)
        .collect().map(x => x.getString(0) -> x).toMap
      r("m").getAs[Double]("fano") shouldBe 0.0
      r("m").getAs[Boolean]("bursty") shouldBe false
      // b: counts (10,1,1) over 10 days: S=12, Σc²=102
      // F = (10*102 - 144)/(10*12) = 876/120 = 7.3
      r("b").getAs[Double]("fano") shouldBe (7.3 +- 1e-12)
      r("b").getAs[Boolean]("bursty") shouldBe true
    }

    it("minEvents filters the noise tail") {
      val df = Seq(("x", 1L), ("y", 1L), ("y", 2L), ("y", 3L))
        .toDF("id", "day")
      Burstiness.fano(df, minEvents = 2, tau = 2.0)
        .collect().map(_.getString(0)).toSeq shouldBe Seq("y")
    }
  }

  describe("SeasonalAnomaly.flag") {
    it("flags the day that is off for ITS weekday, not globally") {
      // 4 weeks; Mondays run at 100, others at 10; one Monday at 10
      // (globally unremarkable, seasonally anomalous)
      val days = (0L until 28L).map { i =>
        val day = 4L + i // day 4 = Monday
        val dow = (day + 3) % 7
        val x = if (dow == 0) { if (day == 11L) 10L else 100L } else 10L
        ("s", day, x)
      }
      val flagged = SeasonalAnomaly.flag(days.toDF("g", "day", "x"),
        k = 1.5).collect()
      flagged.map(_.getAs[Long]("day")).toSeq shouldBe Seq(11L)
      flagged.head.getAs[Double]("z") should be < 0.0
    }

    it("degenerate weekday populations never flag") {
      val df = Seq(("s", 4L, 5L), ("s", 5L, 5L)).toDF("g", "day", "x")
      SeasonalAnomaly.flag(df, k = 0.1).count() shouldBe 0L
    }
  }
}

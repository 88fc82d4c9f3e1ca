package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FdrCupedSpec extends SparkSpec {
  import spark.implicits._

  describe("Fdr.normP") {
    it("matches the normal two-sided p within the A&S error bound") {
      // reference values: erfc(z/sqrt(2)) from libm
      val cases = Seq(0.0 -> 1.0, 1.96 -> 0.04999579029644087,
        2.5758 -> 0.010000847475557371, 3.2905 -> 0.0010000950180775632)
      val df = cases.map(_._1).toDF("z")
      val got = df.select(Fdr.normP(col("z"))).collect()
        .map(_.getDouble(0))
      got.zip(cases.map(_._2)).foreach { case (g, want) =>
        g shouldBe (want +- 3e-7) // |A&S 7.1.26| < 1.5e-7 on erf
      }
    }
  }

  describe("Fdr.bh") {
    it("applies the step-up rule, not a per-test threshold") {
      // classic BH example, m=5, alpha=0.05:
      // p = .010 .013 .014 .19 .35 -> thresholds .01 .02 .03 .04 .05
      // p3=.014 <= .03 so ranks 1..3 reject EVEN THOUGH p2/p3 exceed
      // their own per-rank... p1 alone would pass Bonferroni
      val df = Seq(("t1", 0.010), ("t2", 0.013), ("t3", 0.014),
        ("t4", 0.19), ("t5", 0.35)).toDF("test_id", "p")
      val out = Fdr.bh(df, 0.05).collect()
        .map(r => r.getString(0) -> r.getBoolean(4)).toMap
      out shouldBe Map("t1" -> true, "t2" -> true, "t3" -> true,
        "t4" -> false, "t5" -> false)
    }
    it("rejects nothing when even the smallest p fails its slot") {
      val df = Seq(("a", 0.5), ("b", 0.9)).toDF("test_id", "p")
      Fdr.bh(df, 0.05).collect().map(_.getBoolean(4)).toSeq shouldBe
        Seq(false, false)
    }
  }

  describe("Cuped.adjust") {
    it("removes pre-period-explained variance from the arm gap") {
      // y = x + effect(arm) exactly, with x BALANCED across arms
      // (each x value appears once per arm — otherwise the pooled
      // covariance absorbs part of the treatment): theta = 1 and
      // the adjusted means isolate the pure arm effect
      val units = (0 until 40).map { i =>
        val arm = i % 2
        val x = ((i / 2) * 7) % 100
        ("g", arm.toLong, x.toLong, x.toLong + (if (arm == 1) 10L else 0L))
      }.toDF("g", "arm", "x", "y")
      val out = Cuped.adjust(units).collect()
        .map(r => r.getLong(1) -> (r.getDouble(4), r.getDouble(5)))
        .toMap
      val theta = out(0L)._2
      theta shouldBe 1.0 // perfect pre-period predictor
      (out(1L)._1 - out(0L)._1) shouldBe (10.0 +- 1e-6) // pure effect
    }
    it("theta = 0 and null rho2 when the pre-period is constant") {
      val units = Seq(("g", 0L, 5L, 10L), ("g", 1L, 5L, 20L))
        .toDF("g", "arm", "x", "y")
      val r = Cuped.adjust(units).collect().head
      r.getDouble(r.fieldIndex("theta")) shouldBe 0.0
      r.isNullAt(r.fieldIndex("rho2")) shouldBe true
      // no adjustment: means pass through
      r.getDouble(r.fieldIndex("mean_y_adj")) shouldBe
        r.getDouble(r.fieldIndex("mean_y"))
    }
  }
}

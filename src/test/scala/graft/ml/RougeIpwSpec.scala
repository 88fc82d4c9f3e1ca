package graft.ml

import graft.SparkSpec

class RougeIpwSpec extends SparkSpec {
  import spark.implicits._

  describe("Rouge.rougeN") {
    it("scores identical texts 1.0 and disjoint texts 0.0") {
      val cand = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("p", "text")
      val ref = Seq((1L, "a b c d"), (2L, "q r s t")).toDF("p", "text")
      val out = Rouge.rougeN(cand, ref, "p", "text", n = 2)
        .collect().map(r => r.getAs[Long]("p") ->
          r.getAs[Double]("f1")).toMap
      out(1L) shouldBe 1.0
      out(2L) shouldBe 0.0
    }
    it("clips repeated n-grams at the reference multiset count") {
      // cand has "a a" ×3 (from "a a a a"), ref has it ×1 → match 1
      val cand = Seq((1L, "a a a a")).toDF("p", "text")
      val ref = Seq((1L, "a a b")).toDF("p", "text")
      val r = Rouge.rougeN(cand, ref, "p", "text", n = 2)
        .collect().head
      r.getAs[Long]("n_cand") shouldBe 3L
      r.getAs[Long]("n_ref") shouldBe 2L
      r.getAs[Long]("n_match") shouldBe 1L
    }
    it("drops pairs where a side has no n-grams") {
      val cand = Seq((1L, "solo")).toDF("p", "text") // 1 token → no 2-grams
      val ref = Seq((1L, "a b")).toDF("p", "text")
      Rouge.rougeN(cand, ref, "p", "text", n = 2).count() shouldBe 0L
    }
  }

  describe("Ipw.ate") {
    it("recovers ~zero effect when outcome is treatment-independent") {
      // covariates vary, outcome constant → ATE must be ~0 (clipped
      // propensities keep weights bounded)
      val rows = (1 to 200).map { i =>
        (i % 24L, i % 31L, (i % 2).toLong, 1000L)
      }
      val r = Ipw.ate(rows.toDF("x1", "x2", "label01", "y_cents"),
        "x1", "x2", "label01", "y_cents").collect().head
      math.abs(r.getAs[Double]("ate")) should be < 1.5
      r.getAs[Long]("n") shouldBe 200L
      r.getAs[Long]("n_treat") shouldBe 100L
    }
    it("detects a raw treated-minus-control gap under flat propensity") {
      // no covariate signal → p ≈ 0.5 → IPW ≈ difference of means
      val rows = (1 to 100).map(i =>
        (0L, 0L, (i % 2).toLong, if (i % 2 == 1) 2000L else 1000L))
      val r = Ipw.ate(rows.toDF("x1", "x2", "label01", "y_cents"),
        "x1", "x2", "label01", "y_cents").collect().head
      // means: treated 20.00, ctrl 10.00 → ATE ≈ +10 value units
      r.getAs[Double]("ate") shouldBe 10.0 +- 2.5
    }
    it("ateSql composes the fitSql weight chain without gd_out") {
      val sql = Ipw.ateSql("rel")
      sql should include("ipw_out AS (")
      sql should not include "gd_out"
      sql should include("w2") // epochs=2 final weights CTE
    }
  }

  describe("Eval.liftTable") {
    it("top decile captures all positives of a perfect score") {
      val df = ((1 to 10).map(i => (100L + i, 1L)) ++
        (1 to 90).map(i => (i.toLong, 0L))).toDF("s", "y")
      val out = Eval.liftTable(df, "s", "y", bins = 10).collect()
      val top = out.find(_.getAs[Long]("decile") == 0L).get
      top.getAs[Double]("capture") shouldBe 1.0
      top.getAs[Double]("lift") shouldBe 10.0
      out.map(_.getAs[Long]("n")).sum shouldBe 100L
    }
  }
}

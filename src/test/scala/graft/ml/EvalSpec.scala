package graft.ml

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  describe("Eval.rocAuc") {
    it("scores a perfect ranker 1.0 and a reversed ranker 0.0") {
      // positives all score above negatives
      val df = Seq(("g", 10L, 1L), ("g", 9L, 1L), ("g", 2L, 0L),
        ("g", 1L, 0L)).toDF("g", "s", "y")
      val r = Eval.rocAuc(df, "g", "s", "y").collect().head
      r.getAs[Double]("auc") shouldBe 1.0
      val rev = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 9L, 0L),
        ("g", 10L, 0L)).toDF("g", "s", "y")
      Eval.rocAuc(rev, "g", "s", "y").collect()
        .head.getAs[Double]("auc") shouldBe 0.0
    }
    it("gives ties half credit (midranks)") {
      // one pos and one neg tied → AUC 0.5
      val df = Seq(("g", 5L, 1L), ("g", 5L, 0L)).toDF("g", "s", "y")
      Eval.rocAuc(df, "g", "s", "y").collect()
        .head.getAs[Double]("auc") shouldBe 0.5
    }
    it("returns null AUC for a single-class stratum") {
      val df = Seq(("g", 1L, 1L), ("g", 2L, 1L)).toDF("g", "s", "y")
      val r = Eval.rocAuc(df, "g", "s", "y").collect().head
      r.isNullAt(r.fieldIndex("auc")) shouldBe true
    }
  }

  describe("Eval.reliability") {
    it("puts ties in one bin and reports exact empirical rates") {
      val df = (1 to 40).map(i => (i.toLong / 10, if (i % 2 == 0) 1L else 0L))
        .toDF("s", "y") // 5 distinct scores, heavy ties
      val out = Eval.reliability(df, "s", "y", bins = 4).collect()
      out.map(_.getAs[Long]("n")).sum shouldBe 40L
      // ties can't straddle bins: 5 distinct scores → ≤ 5 bins, ids
      // within the requested 0..3 range
      out.length should be <= 4
      out.foreach { r =>
        r.getAs[Long]("bin") should (be >= 0L and be <= 3L)
        r.getAs[Double]("frac_pos") should (be >= 0.0 and be <= 1.0)
      }
    }
    it("Brier of a perfectly calibrated constant is p(1-p)") {
      // all scores identical → one bin, pred = 0.5, label half 1s
      val df = (1 to 100).map(i => (7L, (i % 2).toLong)).toDF("s", "y")
      val r = Eval.reliability(df, "s", "y", bins = 10).collect()
      r.length shouldBe 1
      r.head.getAs[Double]("mean_pred") shouldBe 0.5 +- 1e-6
      r.head.getAs[Double]("brier") shouldBe 0.25 +- 1e-6
    }
  }

  describe("Eval.ndcgAtK") {
    it("scores the ideal ordering 1.0") {
      val df = Seq(("q", 1L, 30L, 2L), ("q", 2L, 20L, 1L),
        ("q", 3L, 10L, 0L)).toDF("q", "id", "ord", "gain")
      Eval.ndcgAtK(df, "q", "id", "ord", "gain", 3).collect()
        .head.getAs[Double]("ndcg") shouldBe 1.0
    }
    it("penalizes putting the relevant doc last") {
      val df = Seq(("q", 1L, 30L, 0L), ("q", 2L, 20L, 0L),
        ("q", 3L, 10L, 2L)).toDF("q", "id", "ord", "gain")
      val ndcg = Eval.ndcgAtK(df, "q", "id", "ord", "gain", 3)
        .collect().head.getAs[Double]("ndcg")
      // 3 gains at rank 3 vs ideal rank 1: w3/w1 = 0.5
      ndcg shouldBe 0.5 +- 1e-6
    }
    it("nulls nDCG when no doc has positive gain") {
      val df = Seq(("q", 1L, 30L, 0L)).toDF("q", "id", "ord", "gain")
      val r = Eval.ndcgAtK(df, "q", "id", "ord", "gain", 3)
        .collect().head
      r.isNullAt(r.fieldIndex("ndcg")) shouldBe true
    }
    it("weights are the shared µ-literals (w1 = 1e9)") {
      Eval.dcgWeightsMu(3) shouldBe Seq(1000000000L, 630929754L,
        500000000L)
    }
  }
}

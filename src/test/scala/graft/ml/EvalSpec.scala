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

  describe("bucketed rank stats on ALL-DISTINCT continuous scores " +
      "(VERDICT r12 item 4: the shape where the old global window " +
      "funneled everything into one reducer)") {
    import java.math.{BigDecimal => JBig, RoundingMode}
    def r9(x: Double): Double =
      new JBig(x).setScale(9, RoundingMode.HALF_UP).doubleValue()
    // 3000 distinct doubles spanning many range buckets, labels
    // deterministic-pseudo-random, input order scrambled
    val n = 3000
    val rows = (0 until n).map { i =>
      val s = i + 1.0 / (i + 2) // strictly increasing, all distinct
      val y = ((i * 2654435761L >>> 13) % 2).toLong
      (s, y)
    }
    val scrambled = rows.sortBy { case (s, _) => (s * 7919).toLong % 1009 }

    it("rocAuc equals the exact Mann-Whitney reference") {
      val df = scrambled.map { case (s, y) => ("g", s, y) }
        .toDF("g", "s", "y")
      val got = Eval.rocAuc(df, "g", "s", "y").collect().head
      // reference: serial midrank walk over scores ascending
      var cum = 0L; var r2pos = 0L; var npos = 0L
      rows.sortBy(_._1).foreach { case (_, y) =>
        val r2 = 2 * cum + 1 + 1 // n_eq = 1: 2·cum_before + n_eq + 1
        if (y == 1L) { r2pos += r2; npos += 1 }
        cum += 1
      }
      val nneg = n - npos
      val expected = r9((r2pos - npos * (npos + 1)).toDouble /
        (npos * nneg * 2).toDouble)
      got.getAs[Long]("n_pos") shouldBe npos
      got.getAs[Long]("n_neg") shouldBe nneg
      got.getAs[Double]("auc") shouldBe expected
    }

    it("rocAuc stays exact per stratum when strata share the " +
        "score range (global bucket bounds, per-stratum scans)") {
      val df = scrambled.zipWithIndex.map { case ((s, y), i) =>
        (if (i % 2 == 0) "a" else "b", s, y)
      }.toDF("g", "s", "y")
      val got = Eval.rocAuc(df, "g", "s", "y").collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
            r.getAs[Double]("auc"))).toMap
      for (g <- Seq("a", "b")) {
        val mine = scrambled.zipWithIndex
          .filter { case (_, i) => (if (i % 2 == 0) "a" else "b") == g }
          .map(_._1).sortBy(_._1)
        var cum = 0L; var r2pos = 0L; var npos = 0L
        mine.foreach { case (_, y) =>
          if (y == 1L) { r2pos += 2 * cum + 2; npos += 1 }
          cum += 1
        }
        val nneg = mine.length - npos
        val expected = r9((r2pos - npos * (npos + 1)).toDouble /
          (npos * nneg * 2).toDouble)
        withClue(s"stratum $g: ") {
          got(g) shouldBe ((npos, nneg, expected))
        }
      }
    }

    it("a NULL stratum is a kept group (the bucketed join must be " +
        "null-safe, matching the old window's null partition)") {
      val df = Seq((Some("g"), 10L, 1L), (Some("g"), 1L, 0L),
        (None, 9L, 1L), (None, 2L, 0L), (None, 7L, 1L))
        .toDF("g", "s", "y")
      val out = Eval.rocAuc(df, "g", "s", "y").collect()
      out.length shouldBe 2
      val nullRow = out.find(_.isNullAt(0)).get
      nullRow.getAs[Long]("n_pos") shouldBe 2L
      nullRow.getAs[Long]("n_neg") shouldBe 1L
      nullRow.getAs[Double]("auc") shouldBe 1.0 // both pos above the neg
    }

    it("NaN scores rank GREATEST (both engines' sort order), not " +
        "bucket 0 — the arithmetic floor would misplace them") {
      // pos scores: NaN (ranks above everything) — a perfect ranker
      val df = Seq(("g", 0.0, 0L), ("g", 10.0, 0L),
        ("g", Double.NaN, 1L)).toDF("g", "s", "y")
      val r = Eval.rocAuc(df, "g", "s", "y").collect().head
      r.getAs[Double]("auc") shouldBe 1.0
      // and mixed finite+NaN at multi-bucket scale stays exact:
      // NaNs are the ONLY positives → they hold the top midranks
      val big = ((0 until 500).map(i => ("g", i.toDouble, 0L)) ++
        (0 until 5).map(_ => ("g", Double.NaN, 1L))).toDF("g", "s", "y")
      Eval.rocAuc(big, "g", "s", "y").collect()
        .head.getAs[Double]("auc") shouldBe 1.0
    }

    it("reliability equals the serial distinct-score walk") {
      val bins = 10
      val df = scrambled.toDF("s", "y")
      val got = Eval.reliability(df, "s", "y", bins).collect()
        .map(r => r.getAs[Long]("bin") ->
          (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
            r.getAs[Double]("mean_pred"), r.getAs[Double]("frac_pos"),
            r.getAs[Double]("brier"))).toMap
      // serial reference: cum walk in score order, n_eq = 1
      case class Acc(var n: Long = 0, var npos: Long = 0,
        var sumPred: Long = 0, var sq: Long = 0)
      val acc = scala.collection.mutable.Map.empty[Long, Acc]
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, y) =>
        val predMu = math.floor((2 * cum + 1) * 1000000L.toDouble /
          (n * 2).toDouble).toLong
        val bin = math.min(cum * bins / n, bins - 1L)
        val a = acc.getOrElseUpdate(bin, Acc())
        a.n += 1; a.npos += y; a.sumPred += predMu
        a.sq += (if (y == 1L) (predMu - 1000000L) * (predMu - 1000000L)
          else predMu * predMu)
        cum += 1
      }
      got.keySet shouldBe acc.keySet.toSet
      acc.foreach { case (bin, a) =>
        val (gn, gp, mp, fp, br) = got(bin)
        withClue(s"bin $bin: ") {
          gn shouldBe a.n
          gp shouldBe a.npos
          mp shouldBe r9(a.sumPred.toDouble / (a.n * 1000000L).toDouble)
          fp shouldBe r9(a.npos.toDouble / a.n.toDouble)
          br shouldBe r9(a.sq.toDouble / (a.n.toDouble * 1e12))
        }
      }
    }

    it("liftTable equals the serial descending walk") {
      val bins = 10
      val df = scrambled.toDF("s", "y")
      val got = Eval.liftTable(df, "s", "y", bins).collect()
      val ptot = rows.map(_._2).sum
      // descending serial reference
      case class Acc(var n: Long = 0, var npos: Long = 0)
      val acc = scala.collection.mutable.LinkedHashMap.empty[Long, Acc]
      var cum = 0L
      rows.sortBy(-_._1).foreach { case (_, y) =>
        val bin = math.min(cum * bins / n, bins - 1L)
        val a = acc.getOrElseUpdate(bin, Acc())
        a.n += 1; a.npos += y
        cum += 1
      }
      got.length shouldBe acc.size
      var cumPos = 0L
      got.foreach { r =>
        val d = r.getAs[Long]("decile")
        val a = acc(d)
        cumPos += a.npos
        withClue(s"decile $d: ") {
          r.getAs[Long]("n") shouldBe a.n
          r.getAs[Long]("n_pos") shouldBe a.npos
          r.getAs[Double]("lift") shouldBe
            r9((a.npos * n).toDouble / (a.n * ptot).toDouble)
          r.getAs[Double]("capture") shouldBe
            r9(cumPos.toDouble / ptot.toDouble)
        }
      }
    }

    it("plan audit: no unpartitioned window over the distinct-score " +
        "table (the only orderBy-without-partition frames are " +
        "metadata-sized)") {
      val df = scrambled.toDF("s", "y")
      // rocAuc: every WindowExec must be partitioned (the bucket and
      // offset windows both carry partition keys when strata exist)
      val plan = Eval.liftTable(df, "s", "y", 10)
        .queryExecution.optimizedPlan.toString
      // the data-sized window partitions by the range bucket __rb;
      // unpartitioned frames remain only over offs (<=257 rows) and
      // the bins-sized rollup — assert the bucket window exists
      plan should include("__rb")
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

package graft.ml

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  describe("NaiveBayes.trainScore") {
    val train = Seq(
      (1L, "the cat sat", 1L), (2L, "cat cat mat", 1L),
      (3L, "le chien dort", 0L), (4L, "chien et chat", 0L))
      .toDF("id", "text", "y")

    it("classifies in-vocabulary text by its class's tokens") {
      val test = Seq((10L, "cat sat", 1L), (11L, "chien dort", 0L))
        .toDF("id", "text", "y")
      val out = NaiveBayes.trainScore(train, test, "id", "text", "y")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pred"))
        .toMap
      out(10L) shouldBe 1L
      out(11L) shouldBe 0L
    }
    it("degrades gracefully on fully out-of-vocabulary text") {
      val test = Seq((12L, "zzz qqq", 1L)).toDF("id", "text", "y")
      val out = NaiveBayes.trainScore(train, test, "id", "text", "y")
        .collect().head
      out.getAs[Long]("n_tokens") shouldBe 2L
      // OOV tokens contribute identical smoothed floors per class
      // (equal N_c here), leaving only the (flat) prior
      out.getAs[Long]("pred") shouldBe 0L
    }
    it("is case- and whitespace-insensitive like the tokenizer") {
      val test = Seq((13L, "  CAT\tsat ", 1L)).toDF("id", "text", "y")
      NaiveBayes.trainScore(train, test, "id", "text", "y")
        .collect().head.getAs[Long]("n_tokens") shouldBe 2L
    }
  }

  describe("Stump.sweep") {
    it("finds the exact separating threshold") {
      // positives at x ≤ 10, negatives above
      val df = (Seq.tabulate(5)(i => (5L + i, 1L)) ++
        Seq.tabulate(5)(i => (20L + i, 0L))).toDF("x", "y")
      val out = Stump.sweep(df, "x", "y", Seq(5L, 10L, 15L, 25L))
        .collect()
      val best = out.filter(_.getAs[Boolean]("best"))
      best.map(_.getAs[Long]("threshold")).toSeq shouldBe Seq(10L)
      best.head.getAs[Double]("j") shouldBe 1.0
    }
    it("tie-breaks equal-J cuts to the smallest threshold") {
      // a dead zone: thresholds 10 and 15 split identically
      val df = Seq((5L, 1L), (20L, 0L)).toDF("x", "y")
      val best = Stump.sweep(df, "x", "y", Seq(10L, 15L))
        .collect().filter(_.getAs[Boolean]("best"))
      best.map(_.getAs[Long]("threshold")).toSeq shouldBe Seq(10L)
    }
  }

  describe("LogRegGd.fit") {
    it("learns a positive slope on a separable feature") {
      val df = (Seq.tabulate(50)(i => (10L, 0L, 1L)) ++
        Seq.tabulate(50)(i => (0L, 0L, 0L))).toDF("x1", "x2", "y")
      val w = LogRegGd.fit(df, "x1", "x2", "y", epochs = 3).last
      // x1=10 rows are positive, x1=1 negative → w1 > 0
      w.w1 should be > 0L
      val acc = LogRegGd.evaluate(df, "x1", "x2", "y", w)
        .collect().head.getAs[Double]("accuracy")
      acc shouldBe 1.0
    }
    it("keeps driver state to scalars and is idempotent per run") {
      val df = Seq((1L, 2L, 1L), (3L, 4L, 0L), (5L, 6L, 1L))
        .toDF("x1", "x2", "y")
      val a = LogRegGd.fit(df, "x1", "x2", "y", epochs = 2)
      val b = LogRegGd.fit(df, "x1", "x2", "y", epochs = 2)
      a shouldBe b
      a.length shouldBe 2
    }
  }
}

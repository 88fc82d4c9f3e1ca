package graft.text

import graft.SparkSpec

class LmFilterSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)], ref: Seq[String]) =
    LmFilter.unseenGramRatio(
      docs.toDF("id", "text"),
      ref.map(Tuple1(_)).toDF("text"), "id", "text", n = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList

  describe("LmFilter.unseenGramRatio") {
    it("computes exact distinct-bigram hit ratios") {
      // ref bigrams: {the quick, quick brown, brown fox}
      val got = score(
        Seq((1L, "the quick brown fox"), // all 3 seen → 0.0
          (2L, "lazy dog sleeps"), // 2 bigrams, none seen → 1.0
          (3L, "the quick red fox")), // {the quick} seen, {quick red, red fox} not
        Seq("the quick brown fox"))
      got shouldBe List(
        (1L, 3L, 0L, 0.0),
        (2L, 2L, 2L, 1.0),
        (3L, 3L, 2L, round9(2.0 / 3)))
    }

    it("counts DISTINCT grams per doc (repeats collapse)") {
      val got = score(Seq((1L, "go go go go")), Seq("stop"))
      // tokens [go,go,go,go] → distinct bigram {go go} → 1 gram
      got shouldBe List((1L, 1L, 1L, 1.0))
    }

    it("a single-token doc scores its whole text as one gram") {
      val got = score(Seq((1L, "hello")), Seq("hello"))
      got shouldBe List((1L, 1L, 0L, 0.0))
    }

    it("case folds before gram formation") {
      val got = score(Seq((1L, "The Quick BROWN fox")),
        Seq("the quick brown fox"))
      got.head._4 shouldBe 0.0
    }
  }

  describe("LmFilter persisted bigram-LM index") {
    import org.apache.spark.sql.functions._
    val refDf = Seq("the quick brown fox", "the quick red fox jumps")
      .map(Tuple1(_)).toDF("text")
    val docsDf = Seq((1L, "the quick brown fox"), (2L, "purple zz qq"))
      .toDF("doc_id", "text")

    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toList

    it("scoring through the index equals the fresh full recompute") {
      val idx = LmFilter.bigramLmIndex(refDf, "text")
      sorted(LmFilter.scoreAgainstLmIndex(idx, docsDf, "doc_id", "text")) shouldBe
        sorted(LmFilter.bigramLogprob(docsDf, refDf, "doc_id", "text"))
    }

    it("rejects an index without metadata or with a foreign model") {
      val bare = LmFilter.bigramLmIndex(refDf, "text")
        .drop("lm_order", "smoothing_k", "ref_rows", "ref_fp")
      an[IllegalArgumentException] should be thrownBy
        LmFilter.scoreAgainstLmIndex(bare, docsDf, "doc_id", "text")
      val foreign = LmFilter.bigramLmIndex(refDf, "text")
        .withColumn("lm_order", lit(3))
      an[IllegalArgumentException] should be thrownBy
        LmFilter.scoreAgainstLmIndex(foreign, docsDf, "doc_id", "text")
    }

    it("build-or-reuse: second call reuses; changed reference rebuilds") {
      val path = "target/scratch/lmfilter_spec_idx"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      val first = sorted(LmFilter.indexedBigramLogprob(
        spark, path, refDf, docsDf, "doc_id", "text"))
      val t1 = fs.getFileStatus(p).getModificationTime
      // same reference → index untouched (no rewrite), same scores
      val second = sorted(LmFilter.indexedBigramLogprob(
        spark, path, refDf, docsDf, "doc_id", "text"))
      second shouldBe first
      fs.getFileStatus(p).getModificationTime shouldBe t1
      // CHANGED reference → stale fingerprint detected, rebuilt, and
      // the scores equal a fresh train on the new reference
      val ref2 = Seq("completely different words here")
        .map(Tuple1(_)).toDF("text")
      sorted(LmFilter.indexedBigramLogprob(
        spark, path, ref2, docsDf, "doc_id", "text")) shouldBe
        sorted(LmFilter.bigramLogprob(docsDf, ref2, "doc_id", "text"))
    }
  }

  private def round9(d: Double): Double =
    BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
}

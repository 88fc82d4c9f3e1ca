package graft.text

import graft.SparkSpec

/** DSIR scoring contract (Dsir.score): Laplace-smoothed importance
  * ratios hand-verified on a tiny corpus, occurrence multiplicity
  * (not distinct sets), target-resemblance ordering, and the
  * short-doc whole-text fallback.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def score(corpus: Seq[(Long, String)], target: Seq[String]) =
    Dsir.score(corpus.toDF("id", "text"),
        target.map(Tuple1(_)).toDF("text"), "id", "text")
      .select("doc_id", "n_grams", "dsir_score")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq

  describe("Dsir.score") {
    it("matches the hand-computed Laplace arithmetic") {
      // corpus grams: d1 {"a b"}, d2 {"x y"} → N_c=2, V=2;
      // target {"a b"} → N_t=1.
      // λ(a b) = (2/3)/(2/4) = 4/3 → 1.333333 after µ-quantization
      // λ(x y) = (1/3)/(2/4) = 2/3 → 0.666667
      score(Seq(1L -> "a b", 2L -> "x y"), Seq("a b")) shouldBe Seq(
        (1L, 1L, 1.333333), (2L, 1L, 0.666667))
    }
    it("counts gram occurrences, not the distinct set") {
      // "a b a b a" → bigrams (a b, b a, a b, b a): 4 occurrences
      val r = score(Seq(1L -> "a b a b a"), Seq("a b"))
      r.head._2 shouldBe 4L
    }
    it("ranks target-resembling docs above unrelated ones") {
      val r = score(
        Seq(1L -> "the quick brown fox", 2L -> "zzz qqq www vvv"),
        Seq("the quick brown fox jumps"))
      r(0)._3 should be > r(1)._3
    }
    it("falls back to the whole text under 2 tokens") {
      score(Seq(1L -> "solo"), Seq("solo")) shouldBe
        Seq((1L, 1L, 1.0)) // λ = (2/2)/(2/2) = 1 exactly
    }
  }

  describe("Dsir persisted corpus index") {
    val corpus = Seq(1L -> "a b", 2L -> "x y", 3L -> "a b x y")
    val target = Seq("a b")

    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toList

    it("scoring through the index equals the fresh full recompute " +
        "on a corpus-subset batch") {
      val idx = Dsir.corpusIndex(corpus.toDF("id", "text"), "text")
      val batch = corpus.filter(_._1 != 2L)
      val viaIndex = Dsir.scoreAgainstIndex(idx,
        batch.toDF("id", "text"),
        target.map(Tuple1(_)).toDF("text"), "id", "text")
      val fresh = Dsir.score(corpus.toDF("id", "text"),
        target.map(Tuple1(_)).toDF("text"), "id", "text")
        .filter(org.apache.spark.sql.functions.col("doc_id") =!= 2L)
      sorted(viaIndex) shouldBe sorted(fresh)
    }

    it("batch grams unseen in the corpus take the smoothed c_c=0 floor") {
      val idx = Dsir.corpusIndex(corpus.toDF("id", "text"), "text")
      // 'q q' appears in neither corpus nor target:
      // corpus grams: {a b:2, x y:2, b x:1} → N_c=5, V=3; N_t=1
      // λ(q q) = (0+1)/(1+3) / ((0+1)/(5+3)) = 0.25/0.125 = 2.0
      val r = Dsir.scoreAgainstIndex(idx, Seq(9L -> "q q").toDF("id", "text"),
        target.map(Tuple1(_)).toDF("text"), "id", "text").collect().head
      r.getAs[Long]("n_grams") shouldBe 1L
      r.getAs[Double]("dsir_score") shouldBe 2.0
    }

    it("rejects an index without metadata or of a foreign family") {
      import org.apache.spark.sql.functions._
      val idx = Dsir.corpusIndex(corpus.toDF("id", "text"), "text")
      an[IllegalArgumentException] should be thrownBy
        Dsir.scoreAgainstIndex(idx.drop("dsir_fam", "ref_rows", "ref_fp"),
          corpus.toDF("id", "text"),
          target.map(Tuple1(_)).toDF("text"), "id", "text")
      an[IllegalArgumentException] should be thrownBy
        Dsir.scoreAgainstIndex(idx.withColumn("dsir_fam", lit("other-fam")),
          corpus.toDF("id", "text"),
          target.map(Tuple1(_)).toDF("text"), "id", "text")
    }

    it("build-or-reuse: reuses on a matching corpus, rebuilds on a " +
        "changed one or a torn artifact") {
      val path = "target/scratch/dsir_spec_idx"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      def run(c: Seq[(Long, String)]) = sorted(Dsir.indexedScore(
        spark, path, c.toDF("id", "text"),
        target.map(Tuple1(_)).toDF("text"),
        c.toDF("id", "text"), "id", "text"))
      val first = run(corpus)
      val t1 = fs.getFileStatus(p).getModificationTime
      run(corpus) shouldBe first
      fs.getFileStatus(p).getModificationTime shouldBe t1 // reused
      // changed corpus → fingerprint mismatch → rebuild, fresh parity
      val corpus2 = corpus :+ (4L -> "m n")
      run(corpus2) shouldBe sorted(Dsir.score(corpus2.toDF("id", "text"),
        target.map(Tuple1(_)).toDF("text"), "id", "text"))
      // torn artifact → rebuild, not abort
      fs.delete(p, true)
      fs.mkdirs(p)
      val out = fs.create(new org.apache.hadoop.fs.Path(p, "part-torn.parquet"))
      out.write("garbage".getBytes("UTF-8")); out.close()
      run(corpus) shouldBe first
    }
  }
}

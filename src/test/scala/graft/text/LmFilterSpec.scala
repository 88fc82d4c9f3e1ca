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

    it("hashed join keys score exactly as text keys, for all three " +
        "smoothing families (the reconciled gram-key convention)") {
      for (sm <- Seq[LmFilter.Smoothing](LmFilter.AddK(1),
          LmFilter.Interpolated(700), LmFilter.KneserNey(750))) {
        sorted(LmFilter.bigramLogprob(docsDf, refDf, "doc_id", "text",
          smoothing = sm, hashKeys = true)) shouldBe
          sorted(LmFilter.bigramLogprob(docsDf, refDf, "doc_id", "text",
            smoothing = sm))
      }
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

    it("fingerprint separates equal-count duplicate-heavy slices " +
        "(XOR alone cancels even multiplicities)") {
      // {A,A} vs {B,B}: same row count, and both bit-XOR to 0 — the
      // pre-r10 fingerprint collided here and silently reused a
      // stale index. The SUM fold must separate them.
      def fp(texts: String*) = LmFilter.referenceFingerprint(
        texts.map(Tuple1(_)).toDF("text"), "text")
      val aa = fp("alpha alpha beta", "alpha alpha beta")
      val bb = fp("gamma delta gamma", "gamma delta gamma")
      aa._1 shouldBe 2L
      bb._1 shouldBe 2L
      assert(aa._2 != bb._2, "fingerprints must differ")
      // still order-independent and deterministic
      fp("alpha alpha beta", "alpha alpha beta") shouldBe aa
    }

    it("a half-written (corrupt) on-disk index triggers rebuild, " +
        "not an abort") {
      val path = "target/scratch/lmfilter_spec_corrupt_idx"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      // simulate a crashed writer: a directory with one torn file
      // (not parquet) — reading it throws a non-Analysis error, which
      // must be treated as "rebuild", never bubbled to the caller
      fs.mkdirs(p)
      val out = fs.create(new org.apache.hadoop.fs.Path(p, "part-torn.parquet"))
      out.write("not a parquet footer".getBytes("UTF-8"))
      out.close()
      sorted(LmFilter.indexedBigramLogprob(
        spark, path, refDf, docsDf, "doc_id", "text")) shouldBe
        sorted(LmFilter.bigramLogprob(docsDf, refDf, "doc_id", "text"))
      // and the swap left no staging/old residue next to the path
      fs.exists(new org.apache.hadoop.fs.Path(path + ".staging")) shouldBe false
      fs.exists(new org.apache.hadoop.fs.Path(path + ".old")) shouldBe false
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

  describe("LmFilter smoothing families") {
    import org.apache.spark.sql.functions._
    import LmFilter.{AddK, Interpolated}
    val refDf = Seq("a b a").map(Tuple1(_)).toDF("text")

    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toList

    it("interpolated term matches the hand-computed JM chain") {
      // ref tokens [a,b,a]: c_a(a)=2, c_a(b)=1, V=2, T=3; bigram
      // 'a b' count 1. doc 'a b': pml = 1/2, puni = (1+1)/(3+2);
      // λ=0.5 → ln(0.5·0.5 + 0.5·0.4) = ln(0.45) → 6dp −0.798508
      val docs = Seq((1L, "a b")).toDF("doc_id", "text")
      val got = LmFilter.bigramLogprob(docs, refDf, "doc_id", "text",
        smoothing = Interpolated(500)).collect().head
      got.getAs[Long]("n_bigrams") shouldBe 1L
      got.getAs[Long]("n_unseen") shouldBe 0L
      got.getAs[Double]("avg_logprob") shouldBe -0.798508
    }

    it("an unseen-first-token bigram still gets the finite backoff leg") {
      // doc 'z b': c_a(z)=0 → pml leg 0; puni(b) = (1+1)/5 = 0.4;
      // λ=0.5 → ln(0.2) → 6dp −1.609438
      val docs = Seq((1L, "z b")).toDF("doc_id", "text")
      val got = LmFilter.bigramLogprob(docs, refDf, "doc_id", "text",
        smoothing = Interpolated(500)).collect().head
      got.getAs[Long]("n_unseen") shouldBe 1L
      got.getAs[Double]("avg_logprob") shouldBe -1.609438
    }

    it("add-k generalizes: k=2 differs from k=1 and follows the " +
        "(c_ab+k)/(c_a+kV) chain") {
      // doc 'a b': add-1 = ln(2/4), add-2 = ln(3/6) — equal here, so
      // use 'b a': add-1 = ln((1+1)/(1+2)), add-2 = ln((1+2)/(1+4))
      val docs = Seq((1L, "b a")).toDF("doc_id", "text")
      def avg(k: Int) = LmFilter.bigramLogprob(docs, refDf,
        "doc_id", "text", smoothing = AddK(k))
        .collect().head.getAs[Double]("avg_logprob")
      avg(1) shouldBe BigDecimal(math.log(2.0 / 3.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      avg(2) shouldBe BigDecimal(math.log(3.0 / 5.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    it("the persisted index dispatches the scorer from its metadata " +
        "and pins the caller's expectation") {
      val docs = Seq((1L, "a b"), (2L, "b a b")).toDF("doc_id", "text")
      val jm = LmFilter.bigramLmIndex(refDf, "text", Interpolated(700))
      // scoring through the index = fresh recompute with the family
      sorted(LmFilter.scoreAgainstLmIndex(jm, docs, "doc_id", "text")) shouldBe
        sorted(LmFilter.bigramLogprob(docs, refDf, "doc_id", "text",
          smoothing = Interpolated(700)))
      // a caller expecting add-one must fail loudly on a JM artifact
      an[IllegalArgumentException] should be thrownBy
        LmFilter.scoreAgainstLmIndex(jm, docs, "doc_id", "text",
          expected = Some(AddK(1)))
    }

    it("indexedBigramLogprob keyed by smoothing: a family switch " +
        "rebuilds rather than reusing the other family's artifact") {
      val path = "target/scratch/lmfilter_spec_jm_idx"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      val docs = Seq((1L, "a b")).toDF("doc_id", "text")
      val addOne = sorted(LmFilter.indexedBigramLogprob(
        spark, path, refDf, docs, "doc_id", "text"))
      val jm = sorted(LmFilter.indexedBigramLogprob(
        spark, path, refDf, docs, "doc_id", "text", Interpolated(500)))
      assert(jm != addOne, "family switch must change the scores")
      jm shouldBe sorted(LmFilter.bigramLogprob(docs, refDf,
        "doc_id", "text", smoothing = Interpolated(500)))
    }

    it("smoothing codes roundtrip through the metadata encoding") {
      import LmFilter.KneserNey
      LmFilter.decodeSmoothing(AddK(1).code) shouldBe AddK(1)
      LmFilter.decodeSmoothing(AddK(7).code) shouldBe AddK(7)
      LmFilter.decodeSmoothing(Interpolated(700).code) shouldBe
        Interpolated(700)
      LmFilter.decodeSmoothing(KneserNey(750).code) shouldBe
        KneserNey(750)
      an[IllegalArgumentException] should be thrownBy
        LmFilter.decodeSmoothing(0)
      an[IllegalArgumentException] should be thrownBy
        LmFilter.decodeSmoothing(-1000) // the gap between families
    }

    it("Kneser-Ney term matches the hand-computed discount chain") {
      import LmFilter.KneserNey
      // ref 'a b a c': bigrams {a b:1, b a:1, a c:1} → B=3;
      // uni {a:2, b:1, c:1} → V=3; N1+(a)=2, N1+(b)=1;
      // N_ctx(b)=1 (a), N_ctx(a)=1 (b), N_ctx(c)=1 (a).
      // doc 'a b' with D=0.5:
      //   P = max(1−0.5,0)/2 + (0.5·2/2)·((1+1)/(3+3))
      //     = 0.25 + 0.5·(1/3) = 0.41666...
      //   round(ln(P),6) = −0.875469
      val ref = Seq("a b a c").map(Tuple1(_)).toDF("text")
      val docs = Seq((1L, "a b")).toDF("doc_id", "text")
      val got = LmFilter.bigramLogprob(docs, ref, "doc_id", "text",
        smoothing = KneserNey(500)).collect().head
      got.getAs[Long]("n_bigrams") shouldBe 1L
      got.getAs[Long]("n_unseen") shouldBe 0L
      val p = 0.5 / 2.0 + ((0.5 * 2.0) / 2.0) * (2.0 / 6.0)
      got.getAs[Double]("avg_logprob") shouldBe
        BigDecimal(math.log(p))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    it("KN's continuation backoff downweights frequent-but-captive " +
        "tokens (the 'san francisco' property)") {
      import LmFilter.KneserNey
      // 'f' is FREQUENT (4 occurrences) but only ever follows 's';
      // 'y' is rarer (2) but follows two different contexts. After
      // the unseen context 'zz', KN must prefer 'y' over 'f' —
      // add-one smoothing would do the opposite.
      val ref = Seq("s f", "s f", "s f", "s f", "p y", "q y")
        .map(Tuple1(_)).toDF("text")
      val docs = Seq((1L, "zz f"), (2L, "zz y")).toDF("doc_id", "text")
      val kn = LmFilter.bigramLogprob(docs, ref, "doc_id", "text",
          smoothing = KneserNey(750))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Double]("avg_logprob")).toMap
      kn(2L) should be > kn(1L) // y beats f after an unseen context
      val addOne = LmFilter.bigramLogprob(docs, ref, "doc_id", "text")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Double]("avg_logprob")).toMap
      addOne(2L) shouldBe addOne(1L) // add-one cannot tell them apart
    }

    it("KN degenerate contexts back off to the continuation " +
        "probability (c_a = 0 or N1+(a) = 0)") {
      import LmFilter.KneserNey
      // ref 'a b': uni {a:1, b:1}, bigrams {a b:1} → B=1, V=2;
      // N1+(b) = 0 (b only ends the doc), N_ctx(a) = 0 (a never a
      // second token). doc 'b a': c_a(b)=1 > 0 but N1+(b)=0 →
      // P = P_cont(a) = (0+1)/(1+2) = 1/3.
      // doc 'z a': c_a(z)=0 → same backoff, P = 1/3.
      val ref = Seq("a b").map(Tuple1(_)).toDF("text")
      val docs = Seq((1L, "b a"), (2L, "z a")).toDF("doc_id", "text")
      val got = LmFilter.bigramLogprob(docs, ref, "doc_id", "text",
          smoothing = KneserNey(500))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Double]("avg_logprob")).toMap
      val expected = BigDecimal(math.log(1.0 / 3.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      got(1L) shouldBe expected
      got(2L) shouldBe expected
    }

    it("the persisted index serves the KN family transparently") {
      import LmFilter.KneserNey
      val ref = Seq("a b a c", "c a b").map(Tuple1(_)).toDF("text")
      val docs = Seq((1L, "a b c"), (2L, "b a")).toDF("doc_id", "text")
      val idx = LmFilter.bigramLmIndex(ref, "text", KneserNey(750))
      sorted(LmFilter.scoreAgainstLmIndex(idx, docs, "doc_id", "text")) shouldBe
        sorted(LmFilter.bigramLogprob(docs, ref, "doc_id", "text",
          smoothing = KneserNey(750)))
    }
  }

  describe("LmFilter order-3 Kneser-Ney") {
    import org.apache.spark.sql.functions._
    import LmFilter.KneserNey
    // ref 'a b c a b d': uni {a:2,b:2,c:1,d:1} → V=4; bigrams
    // {a b:2, b c:1, c a:1, b d:1} → B=4; trigrams {a b c, b c a,
    // c a b, a b d} (each ×1). Continuations: n1p3(a b)=2,
    // nctx3(b c)=1, nmid(b)=2, n1pmid(b)=2, nctx2(c)=1.
    val refDf = Seq("a b c a b d").map(Tuple1(_)).toDF("text")

    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toList
    def ln6(p: Double): Double = BigDecimal(math.log(p))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    it("matches the hand-computed three-level chain (D = 0.5)") {
      // doc 'a b c': P_cont(c) = (1+1)/(4+4) = 0.25;
      // P2(c|b) = max(1−.5,0)/2 + (.5·2/2)·0.25 = 0.375;
      // P3 = max(1−.5,0)/2 + (.5·2/2)·0.375 = 0.4375
      val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
      val got = LmFilter.trigramLogprob(docs, refDf, "doc_id", "text",
        KneserNey(500)).collect().head
      got.getAs[Long]("n_trigrams") shouldBe 1L
      got.getAs[Long]("n_unseen") shouldBe 0L
      got.getAs[Double]("avg_logprob") shouldBe ln6(0.4375)
    }

    it("degenerate contexts back off level by level") {
      val docs = Seq(
        (1L, "z b c"), // prefix 'z b' unseen → P2(c|b) = 0.375
        (2L, "a d c"), // prefix unseen AND mid 'd' never a trigram
                       // middle → P_cont(c) = 0.25
        (3L, "b d x")) // bigram 'b d' EXISTS (doc-final) but has no
                       // trigram continuation → n1p3=0 → P2(x|d) →
                       // nmid(d)=0 → P_cont(x) = (0+1)/8
        .toDF("doc_id", "text")
      val got = LmFilter.trigramLogprob(docs, refDf, "doc_id", "text",
          KneserNey(500))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_unseen"), r.getAs[Double]("avg_logprob"))))
        .toMap
      got(1L) shouldBe ((1L, ln6(0.375)))
      got(2L) shouldBe ((1L, ln6(0.25)))
      got(3L) shouldBe ((1L, ln6(0.125)))
    }

    it("documents with fewer than 3 tokens drop (score undefined)") {
      val docs = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
      LmFilter.trigramLogprob(docs, refDf, "doc_id", "text",
        KneserNey(500)).select("doc_id").as[Long].collect()
        .toSeq shouldBe Seq(2L)
    }

    it("the persisted order-3 index scores identically to the fresh " +
        "recompute, text AND hashed join keys") {
      val ref = Seq("a b c a b d e", "c a b e d").map(Tuple1(_))
        .toDF("text")
      val docs = Seq((1L, "a b c d"), (2L, "e c a b"), (3L, "z q a b c"))
        .toDF("doc_id", "text")
      val fresh = sorted(LmFilter.trigramLogprob(docs, ref,
        "doc_id", "text", KneserNey(750)))
      val idx = LmFilter.trigramLmIndex(ref, "text", KneserNey(750))
      sorted(LmFilter.scoreAgainstLmIndex(idx, docs,
        "doc_id", "text")) shouldBe fresh
      sorted(LmFilter.trigramLogprob(docs, ref, "doc_id", "text",
        KneserNey(750), hashKeys = true)) shouldBe fresh
    }

    it("order-3 metadata dispatches and cross-order probes fail " +
        "loudly") {
      val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
      val idx3 = LmFilter.trigramLmIndex(refDf, "text", KneserNey(500))
      // caller pinning the wrong family fails
      an[IllegalArgumentException] should be thrownBy
        LmFilter.scoreAgainstLmIndex(idx3, docs, "doc_id", "text",
          expected = Some(LmFilter.AddK(1)))
      // an order-3 artifact claiming a non-KN family is rejected
      val foreign = idx3.withColumn("smoothing_k", lit(1))
      an[IllegalArgumentException] should be thrownBy
        LmFilter.scoreAgainstLmIndex(foreign, docs, "doc_id", "text")
    }

    it("build-or-reuse on its own path: reuse, then rebuild on a " +
        "changed reference") {
      val path = "target/scratch/lmfilter_spec_kn3_idx"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
      val first = sorted(LmFilter.indexedTrigramLogprob(
        spark, path, refDf, docs, "doc_id", "text", KneserNey(500)))
      first shouldBe sorted(LmFilter.trigramLogprob(docs, refDf,
        "doc_id", "text", KneserNey(500)))
      val t1 = fs.getFileStatus(p).getModificationTime
      sorted(LmFilter.indexedTrigramLogprob(
        spark, path, refDf, docs, "doc_id", "text",
        KneserNey(500))) shouldBe first
      fs.getFileStatus(p).getModificationTime shouldBe t1
      val ref2 = Seq("x y z x y w").map(Tuple1(_)).toDF("text")
      sorted(LmFilter.indexedTrigramLogprob(
        spark, path, ref2, docs, "doc_id", "text",
        KneserNey(500))) shouldBe
        sorted(LmFilter.trigramLogprob(docs, ref2, "doc_id", "text",
          KneserNey(500)))
    }
  }

  private def round9(d: Double): Double =
    BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
}

package graft.quality

import graft.SparkSpec

class EntropyReadabilitySpec extends SparkSpec {
  import spark.implicits._

  describe("Entropy.profile") {
    it("classifies constant / id_like / categorical columns") {
      val df = (1 to 100).map(i => (i.toLong, "x", s"cat${i % 4}"))
        .toDF("id", "const", "cat")
      val r = Entropy.profile(df, Seq("id", "const", "cat"))
        .collect().map(x => x.getString(0) -> x).toMap
      r("id").getAs[String]("class") shouldBe "id_like"
      r("const").getAs[String]("class") shouldBe "constant"
      r("cat").getAs[String]("class") shouldBe "categorical"
    }

    it("computes uniform-distribution entropy = ln(k)") {
      val df = (1 to 80).map(i => s"v${i % 8}").toDF("c")
      val h = Entropy.profile(df, Seq("c")).collect().head
        .getAs[Double]("entropy_nats")
      h shouldBe (math.log(8) +- 1e-6)
    }

    it("constant column has zero entropy and full top_share") {
      val df = Seq.fill(10)("k").toDF("c")
      val row = Entropy.profile(df, Seq("c")).collect().head
      row.getAs[Double]("entropy_nats") shouldBe 0.0
      row.getAs[Double]("top_share") shouldBe 1.0
    }

    it("all-null column still reports, with null entropy") {
      val df = Seq.fill(5)(Option.empty[String]).toDF("c")
      val row = Entropy.profile(df, Seq("c")).collect().head
      row.getAs[Long]("n") shouldBe 0L
      row.getAs[Long]("n_nulls") shouldBe 5L
      row.isNullAt(row.fieldIndex("entropy_nats")) shouldBe true
      row.getAs[String]("class") shouldBe "constant"
    }

    it("nulls are excluded from the census but counted") {
      val df = Seq(Some("a"), Some("a"), Some("b"), None).toDF("c")
      val row = Entropy.profile(df, Seq("c")).collect().head
      row.getAs[Long]("n") shouldBe 3L
      row.getAs[Long]("n_nulls") shouldBe 1L
      row.getAs[Long]("n_distinct") shouldBe 2L
    }
  }

  describe("Readability.score") {
    import graft.text.Readability

    it("counts words, sentences, and vowel groups") {
      val df = Seq((1L, "The quick brown fox. It jumps!")).toDF("id", "t")
      val r = Readability.score(df, "id", "t").collect().head
      r.getAs[Long]("n_words") shouldBe 6L
      r.getAs[Long]("n_sentences") shouldBe 2L
      // vowel groups: e|ui|o|o|i|u (jumps) = The(1) qu+i(1) brown(1)
      // fox(1) It(1) jumps(1) = 6
      r.getAs[Long]("n_syllables") shouldBe 6L
      // ease = 206.835 - 1.015*3 - 84.6*1 = 119.19
      r.getAs[Double]("reading_ease") shouldBe (119.19 +- 1e-9)
    }

    it("unpunctuated text is one sentence; empty text scores null") {
      val df = Seq((1L, "plain words here"), (2L, "")).toDF("id", "t")
      val rows = Readability.score(df, "id", "t").orderBy("id").collect()
      rows(0).getAs[Long]("n_sentences") shouldBe 1L
      rows(1).getAs[Long]("n_words") shouldBe 0L
      rows(1).isNullAt(rows(1).fieldIndex("reading_ease")) shouldBe true
      rows(1).isNullAt(rows(1).fieldIndex("fk_grade")) shouldBe true
    }

    it("long-winded polysyllabic prose scores harder (lower ease)") {
      val simple = "The cat sat. The dog ran. It was fun."
      val dense = "Extraordinarily comprehensive organizational " +
        "documentation necessitates unambiguous interpretation"
      val df = Seq((1L, simple), (2L, dense)).toDF("id", "t")
      val rows = Readability.score(df, "id", "t").orderBy("id").collect()
      rows(0).getAs[Double]("reading_ease") should be >
        rows(1).getAs[Double]("reading_ease")
      rows(1).getAs[Double]("fk_grade") should be >
        rows(0).getAs[Double]("fk_grade")
    }
  }
}

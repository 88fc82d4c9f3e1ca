package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EncodersSamplingCapSpec extends SparkSpec {
  import spark.implicits._

  describe("Encoders.meanTarget") {
    it("shrinks rare categories toward the global mean") {
      // global: 6 rows, sum 600, mean 100
      // freq cat "a": 5 rows mean 40; rare cat "b": 1 row value 400
      val df = Seq(("a", 40L), ("a", 40L), ("a", 40L), ("a", 40L),
        ("a", 40L), ("b", 400L)).toDF("cat", "y")
      val r = Encoders.meanTarget(df, m = 4).orderBy("category").collect()
      // enc(a) = (200 + 4*100)/(5+4) = 600/9 = 66.67 (pulled up)
      r(0).getAs[Double]("encoding") shouldBe (600.0 / 9 +- 1e-5)
      // enc(b) = (400 + 400)/(1+4) = 160 (pulled hard toward 100)
      r(1).getAs[Double]("encoding") shouldBe 160.0
    }

    it("m = 0 reproduces the raw category means") {
      val df = Seq(("a", 10L), ("a", 30L), ("b", 100L)).toDF("cat", "y")
      val r = Encoders.meanTarget(df, m = 0).orderBy("category").collect()
      r(0).getAs[Double]("encoding") shouldBe 20.0
      r(1).getAs[Double]("encoding") shouldBe 100.0
    }
  }

  describe("Sampling.capPerClass") {
    val df = (1L to 100L).map(i => (if (i <= 80) "big" else "small", i))
      .toDF("cls", "id")

    it("caps only classes over k and keeps small classes whole") {
      val kept = Sampling.capPerClass(df, "cls", "id", 30)
      val counts = kept.groupBy("cls").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      counts("big") shouldBe 30L
      counts("small") shouldBe 20L
    }

    it("selection is deterministic and hash-ranked, not prefix-biased") {
      val a = Sampling.capPerClass(df, "cls", "id", 30)
        .agg(sum("id")).collect().head.getLong(0)
      val b = Sampling.capPerClass(df.orderBy(rand(7)), "cls", "id", 30)
        .agg(sum("id")).collect().head.getLong(0)
      a shouldBe b
      // not simply ids 1..30: the hash order mixes the range
      val ids = Sampling.capPerClass(df, "cls", "id", 30)
        .filter(col("cls") === "big").select("id").as[Long].collect().toSet
      ids should not be (1L to 30L).toSet
    }
  }

  describe("FeatureHash.census") {
    import graft.text.FeatureHash
    it("conserves occurrences and buckets deterministically") {
      val docs = Seq("the cat sat", "the dog ran the mile")
        .toDF("text")
      val r = FeatureHash.census(docs, "text", 8).collect()
      r.map(_.getAs[Long]("n_occurrences")).sum shouldBe 8L
      // "the" occurs 3x in one bucket: that bucket's occurrences
      // exceed its distinct count
      r.exists(x => x.getAs[Long]("n_occurrences") >
        x.getAs[Long]("n_distinct_tokens")) shouldBe true
    }

    it("same token always lands in the same bucket") {
      val docs = Seq("alpha beta", "beta gamma alpha").toDF("text")
      val perTok = docs.select(explode(split(col("text"), " ")).as("w"))
        .select(col("w"), FeatureHash.bucketOf(col("w"), 16).as("b"))
        .distinct().groupBy("w").count().collect()
      all(perTok.map(_.getLong(1))) shouldBe 1L
    }
  }

  describe("LmFilter.bigramLogprob") {
    import graft.text.LmFilter
    it("scores reference-fluent text higher than unseen text") {
      val ref = Seq((1L, "the cat sat on the mat"),
        (2L, "the cat ran on the mat")).toDF("doc_id", "text")
      val docs = Seq((10L, "the cat sat"), (11L, "zz qq ww"))
        .toDF("doc_id", "text")
      val r = LmFilter.bigramLogprob(docs, ref, "doc_id", "text")
        .orderBy("doc_id").collect()
      r(0).getAs[Double]("avg_logprob") should be >
        r(1).getAs[Double]("avg_logprob")
      r(0).getAs[Long]("n_unseen") shouldBe 0L
      r(1).getAs[Long]("n_unseen") shouldBe 2L
    }

    it("computes the add-one smoothed probability exactly") {
      // ref: "a b a b" -> unigrams: a:2 b:2, V=2; bigrams: "a b":2, "b a":1
      val ref = Seq((1L, "a b a b")).toDF("doc_id", "text")
      val docs = Seq((10L, "a b")).toDF("doc_id", "text")
      val r = LmFilter.bigramLogprob(docs, ref, "doc_id", "text")
        .collect().head
      // P(b|a) = (2+1)/(2+2) = 0.75
      r.getAs[Double]("avg_logprob") shouldBe
        (BigDecimal(math.log(0.75)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9)
    }

    it("documents with fewer than two tokens drop out") {
      val ref = Seq((1L, "a b c")).toDF("doc_id", "text")
      val docs = Seq((10L, "a"), (11L, "")).toDF("doc_id", "text")
      LmFilter.bigramLogprob(docs, ref, "doc_id", "text")
        .count() shouldBe 0L
    }
  }
}

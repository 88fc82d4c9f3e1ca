package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.Multimodal

class TextAnalysisSpec extends SparkSpec {
  import TextAnalysis._

  private def one(text: String) = {
    import spark.implicits._
    Seq(1L -> text).toDF("doc_id", "text")
  }

  describe("TextAnalysis") {
    it("substrCount counts non-overlapping occurrences") {
      import spark.implicits._
      one("the cat the hat").select(substrCount(padded(col("text")), " the "))
        .as[Long].head() shouldBe 2L
    }
    it("wsTokenCount counts single-space tokens") {
      import spark.implicits._
      one("a b c d").select(wsTokenCount(col("text"))).as[Long].head() shouldBe 4L
    }
    it("predictedLang picks the language with the most markers") {
      import spark.implicits._
      Seq("the cat and a dog", "der hund und die katze",
        "le chat et les autres", "xyzzy plugh")
        .toDF("text").select(predictedLang(col("text")))
        .as[String].collect() shouldBe Array("en", "de", "fr", "und")
    }
    it("rollingFingerprint matches the hand-computed polynomial") {
      import spark.implicits._
      // "ab": ((0*31+97)*31+98) % 1e9+7 = 3105
      one("ab").select(rollingFingerprint(col("text")))
        .as[Long].head() shouldBe 3105L
    }
    it("token counts split alpha runs, digit runs and punct chars") {
      import spark.implicits._
      val r = one("ab2 cd-9!").select(
        alphaRunCount(col("text")), digitRunCount(col("text")),
        punctCharCount(col("text"))).as[(Long, Long, Long)].head()
      r shouldBe ((2L, 2L, 2L)) // [ab, cd], [2, 9], [-, !]
    }
  }

  describe("Multimodal") {
    it("attaches typed metadata and decodes deterministically in batches") {
      import spark.implicits._
      val docs = (0L until 10L).map(i => i -> s"payload-$i").toDF("doc_id", "text")
      val dec = Multimodal.decodeBatches(
        Multimodal.attachBinary(docs, "doc_id", "text"), batchSize = 3)
      dec.count() shouldBe 10
      // deterministic: same input → same decoded dims
      val a = dec.select("doc_id", "decoded.width").collect().toSet
      val b = Multimodal.decodeBatches(
        Multimodal.attachBinary(docs, "doc_id", "text"), batchSize = 7)
        .select("doc_id", "decoded.width").collect().toSet
      a shouldBe b
      // mime assignment is id-stable and width only set for visual media
      dec.filter(col("mime") === "audio/wav")
        .select("decoded.sample_rate").collect()
        .foreach(r => r.getInt(0) should be > 0)
    }
    it("sampleFrames emits every Nth frame index for video assets only") {
      import spark.implicits._
      val docs = (0L until 30L).map(i => i -> s"p$i").toDF("doc_id", "text")
      val dec = Multimodal.decodeBatches(
        Multimodal.attachBinary(docs, "doc_id", "text"))
      val frames = Multimodal.sampleFrames(dec, everyN = 10)
      frames.select("mime").distinct().as[String].collect() shouldBe
        Array("video/mp4")
      // every video contributes ceil(n_frames/10) sampled frames
      val perDoc = frames.groupBy("doc_id").count()
        .join(dec.select(col("doc_id"), col("decoded.n_frames").as("nf")), "doc_id")
        .as[(Long, Long, Int)].collect()
      perDoc.foreach { case (_, n, nf) =>
        n shouldBe ((nf + 9) / 10).toLong
      }
    }
  }
}

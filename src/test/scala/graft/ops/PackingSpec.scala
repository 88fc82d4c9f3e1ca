package graft.ops

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  describe("Packing.tokenOffsets") {
    it("computes the exclusive prefix sum in order, across buckets") {
      val df = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("id", "tok")
      val out = Packing.tokenOffsets(df, "id", "tok", nBuckets = 8)
        .orderBy("id").select("id", "tok", "offset")
        .as[(Long, Long, Long)].collect()
      var acc = 0L
      out.foreach { case (_, tok, off) =>
        off shouldBe acc
        acc += tok
      }
    }
    it("drops zero-token rows and survives an empty input") {
      val df = Seq((1L, 0L), (2L, 5L)).toDF("id", "tok")
      Packing.tokenOffsets(df, "id", "tok").select("id", "offset")
        .as[(Long, Long)].collect() shouldBe Array((2L, 0L))
      Packing.tokenOffsets(df.filter($"tok" < 0), "id", "tok").count() shouldBe 0
    }
  }

  describe("Packing.packSpans") {
    it("splits a straddling doc across sequences, conserving tokens") {
      // docs of 6 tokens each, block 10: doc2 straddles seq0/seq1
      val df = Seq((1L, 6L), (2L, 6L), (3L, 6L)).toDF("id", "tok")
      val out = Packing.packSpans(df, "id", "tok", blockSize = 10L)
        .orderBy("seq_id", "id").as[(Long, Long, Long)].collect()
      out shouldBe Array(
        (0L, 1L, 6L), (0L, 2L, 4L),
        (1L, 2L, 2L), (1L, 3L, 6L))
    }
    it("every full sequence holds exactly blockSize tokens") {
      val df = (1L to 50L).map(i => (i, i % 5 + 1)).toDF("id", "tok")
      val manifest = Packing.sequenceManifest(df, "id", "tok", 16L)
        .orderBy("seq_id").as[(Long, Long, Long, Long, Long)].collect()
      val total = df.as[(Long, Long)].collect().map(_._2).sum
      manifest.init.foreach(_._3 shouldBe 16L)
      manifest.map(_._3).sum shouldBe total
      manifest.last._3 should be <= 16L
    }
  }
}

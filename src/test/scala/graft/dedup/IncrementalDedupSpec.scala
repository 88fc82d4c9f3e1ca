package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Incremental MinHash-LSH: index persistability, batch-vs-index
  * matching without corpus text, and parameter-mismatch hygiene.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "pack my box with five dozen liquor jugs right now"),
    (3L, "sphinx of black quartz judge my vow said the king"))
    .toDF("doc_id", "text")

  describe("Dedup.minhashIndex") {
    it("emits one row per (doc, band) with ids, hashes, and banding metadata") {
      val idx = Dedup.minhashIndex(corpus(), "doc_id", "text",
        numHashes = 16, bands = 4)
      idx.columns.toSeq shouldBe Seq("doc_id", "hs", "band_id", "band_hash",
        "shingle_k", "num_hashes", "num_bands")
      idx.count() shouldBe 3 * 4
      idx.select(countDistinct("doc_id")).head().getLong(0) shouldBe 3
      idx.select("shingle_k", "num_hashes", "num_bands").distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq shouldBe
        Seq((3, 16, 4))
    }

    it("round-trips through parquet unchanged") {
      val path = java.nio.file.Files.createTempDirectory("idx").toString + "/ix"
      val idx = Dedup.minhashIndex(corpus(), "doc_id", "text")
      idx.write.parquet(path)
      val back = spark.read.parquet(path)
      back.orderBy("doc_id", "band_id").collect() shouldBe
        idx.orderBy("doc_id", "band_id").collect()
    }
  }

  describe("Dedup.minhashLshAgainstIndex") {
    it("matches a near-copy batch to its originals, never to others") {
      val idx = Dedup.minhashIndex(corpus(), "doc_id", "text")
      val batch = Seq(
        (100L, "zq the quick brown fox jumps over the lazy dog tonight"),
        (200L, "completely unrelated content about spark shuffles and parquet"))
        .toDF("doc_id", "text")
      val m = Dedup.minhashLshAgainstIndex(idx, batch, "doc_id", "text")
        .collect()
      m.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((1L, 100L))
      m.head.getDouble(2) should be >= 0.7
    }

    it("an exact duplicate matches with jaccard 1") {
      val idx = Dedup.minhashIndex(corpus(), "doc_id", "text")
      val batch = Seq((300L, "pack my box with five dozen liquor jugs right now"))
        .toDF("doc_id", "text")
      val m = Dedup.minhashLshAgainstIndex(idx, batch, "doc_id", "text").collect()
      m.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq shouldBe
        Seq((2L, 300L, 1.0))
    }

    it("rejects a probe whose banding parameters mismatch the index") {
      val idx = Dedup.minhashIndex(corpus(), "doc_id", "text",
        numHashes = 16, bands = 4)
      val batch = Seq((300L, "pack my box with five dozen liquor jugs right now"))
        .toDF("doc_id", "text")
      val e = intercept[IllegalArgumentException] {
        Dedup.minhashLshAgainstIndex(idx, batch, "doc_id", "text",
          numHashes = 16, bands = 8)
      }
      e.getMessage should include("(3,16,4)")
    }

    it("rejects an index stripped of its banding metadata") {
      val idx = Dedup.minhashIndex(corpus(), "doc_id", "text")
        .drop("shingle_k", "num_hashes", "num_bands")
      val batch = Seq((300L, "pack my box with five dozen liquor jugs right now"))
        .toDF("doc_id", "text")
      intercept[IllegalArgumentException] {
        Dedup.minhashLshAgainstIndex(idx, batch, "doc_id", "text")
      }.getMessage should include("metadata")
    }

    it("the anti-join composition drops matched batch docs") {
      val idx = Dedup.minhashIndex(corpus(), "doc_id", "text")
      val batch = Seq(
        (100L, "zq the quick brown fox jumps over the lazy dog tonight"),
        (200L, "fresh novel content that belongs in the corpus today"))
        .toDF("doc_id", "text")
      val dupIds = Dedup.minhashLshAgainstIndex(idx, batch, "doc_id", "text")
        .select(col("b").as("doc_id")).distinct()
      val kept = batch.join(dupIds, Seq("doc_id"), "left_anti")
      kept.select("doc_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(200L)
    }
  }
}

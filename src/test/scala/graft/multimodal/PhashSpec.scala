package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q145's parts: real-IDAT PNG round-trip, decode quarantine, and
  * band-join completeness of the Hamming pair search.
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  describe("MediaCodec greyscale PNG") {
    it("round-trips pixels through a real zlib IDAT") {
      val px = Phash.fixturePixels(7L)
      val bytes = MediaCodec.synthesizePngGray(px)
      MediaCodec.parsePngGray(bytes).map(_.toSeq) shouldBe Some(px.toSeq)
    }

    it("quarantines payloads without decodable pixel data") {
      // metadata-only PNG (no IDAT), truncated file, garbage
      MediaCodec.parsePngGray(MediaCodec.synthesizePng(8, 8)) shouldBe None
      val good = MediaCodec.synthesizePngGray(Phash.fixturePixels(1L))
      MediaCodec.parsePngGray(good.take(40)) shouldBe None
      MediaCodec.parsePngGray("not a png".getBytes) shouldBe None
    }
  }

  describe("hashAssets") {
    it("hashes decodable assets and drops malformed ones") {
      val rows = Seq(
        (1L, MediaCodec.synthesizePngGray(Phash.fixturePixels(1L))),
        (2L, "garbage".getBytes),
        (3L, MediaCodec.synthesizePngGray(Phash.fixturePixels(3L))))
        .toDF("doc_id", "payload")
      val out = Phash.hashAssets(rows, "doc_id", "payload")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      out.keySet shouldBe Set(1L, 3L)
    }

    it("identical pixels hash identically; a swapped pair stays within 2 bits") {
      val ids = Seq(0L, 1L, 2L, 3L, 4L) // one fixture group
      val df = ids.map(id =>
          (id, MediaCodec.synthesizePngGray(Phash.fixturePixels(id))))
        .toDF("doc_id", "payload")
      val h = Phash.hashAssets(df, "doc_id", "payload")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      h(0L) shouldBe h(4L) // exact re-encode
      ids.filter(r => r >= 1 && r <= 3).foreach { r =>
        java.lang.Long.bitCount(h(0L) ^ h(r)) should be <= 2
      }
    }
  }

  describe("MediaCodec PCM-16 WAV") {
    it("round-trips signed samples through a real data chunk") {
      val s = Phash.fixtureSamples(12L)
      s.min should be < 0 // sign handling is actually exercised
      val bytes = MediaCodec.synthesizeWavPcm16(16000, s)
      MediaCodec.parseWavPcm16(bytes).map(_.toSeq) shouldBe Some(s.toSeq)
    }

    it("quarantines non-PCM16-mono or malformed payloads") {
      MediaCodec.parseWavPcm16("RIFFgarbage".getBytes) shouldBe None
      MediaCodec.parseWavPcm16(
        MediaCodec.synthesizeJpeg(8, 8)) shouldBe None
      val good = MediaCodec.synthesizeWavPcm16(16000, Array(1, -2, 3))
      MediaCodec.parseWavPcm16(good.take(40)) shouldBe None
    }
  }

  describe("hashWavAssets") {
    it("fingerprints rising edges; swapped fixture pair stays within 3 bits") {
      import spark.implicits._
      val ids = Seq(0L, 1L, 2L, 3L, 4L)
      val df = ids.map(id =>
          (id, MediaCodec.synthesizeWavPcm16(16000, Phash.fixtureSamples(id))))
        .toDF("doc_id", "payload")
      val h = Phash.hashWavAssets(df, "doc_id", "payload")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      h(0L) shouldBe h(4L) // exact re-encode
      ids.filter(r => r >= 1 && r <= 3).foreach { r =>
        java.lang.Long.bitCount(h(0L) ^ h(r)) should be <= 3
      }
    }

    it("drops payloads shorter than 65 samples") {
      import spark.implicits._
      val df = Seq(
        (1L, MediaCodec.synthesizeWavPcm16(16000, Array.fill(64)(7))),
        (2L, MediaCodec.synthesizeWavPcm16(16000, Phash.fixtureSamples(2L))))
        .toDF("doc_id", "payload")
      Phash.hashWavAssets(df, "doc_id", "payload")
        .collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
    }
  }

  describe("nearDupPairs") {
    it("matches the brute-force Hamming pair set (band-join completeness)") {
      // adversarial spread: hashes at controlled distances incl. a
      // pair differing ONLY inside one band, one spanning all bands,
      // and sign-bit (bit 63) flips
      val hs = Seq(
        10L -> 0x0123456789ABCDEFL,
        11L -> 0x0123456789ABCDEEL, // d=1 (inside band 0)
        12L -> 0x0123456789ABCDECL, // d(11)=1, d(10)=2
        13L -> 0x8123456789ABCDEFL, // d(10)=1 via bit 63
        14L -> 0x0123056709AB0DEFL, // spread across bands
        15L -> -1L,
        16L -> 0L)
      val df = hs.toDF("doc_id", "ahash")
      val got = Phash.nearDupPairs(df, "doc_id", "ahash", tau = 3, bands = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (a, ha) <- hs; (b, hb) <- hs if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
      } yield (a, b, d)).toSet
      got shouldBe want
      want should not be empty
    }

    it("rejects tau >= bands (completeness precondition)") {
      val df = Seq((1L, 0L)).toDF("doc_id", "ahash")
      an[IllegalArgumentException] should be thrownBy
        Phash.nearDupPairs(df, "doc_id", "ahash", tau = 4, bands = 4)
    }
  }
}

package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "target/scratch/warc_spec"

  describe("Warc write→read round-trip") {
    it("recovers every (url, payload) exactly, across shards") {
      val rows = (1 to 200).map(i =>
        (s"https://h${i % 3}.com/p/$i", s"payload $i\nline two €$i"))
      Warc.write(rows.toDF("url", "payload"), "url", "payload", dir, 4)
      val back = Warc.read(spark, s"$dir/part-*").collect()
        .map(r => (r.url, r.payload)).sortBy(_._1)
      back.toSeq shouldBe rows.sortBy(_._1)
      // distributed by file: 4 shard files
      Warc.read(spark, s"$dir/part-*").select("file").distinct().count() shouldBe 4
    }

    it("payloads containing the record magic do not split records") {
      val rows = Seq(("https://a.com/x",
        "fake header inside: WARC/1.0\r\nContent-Length: 999\r\n\r\n tail"))
      Warc.write(rows.toDF("url", "payload"), "url", "payload", dir + "_m", 1)
      val back = Warc.read(spark, s"${dir}_m/part-*").collect()
      back.map(r => (r.url, r.payload)).toSeq shouldBe rows
    }

    it("Content-Length is byte-accurate for multi-byte text") {
      val payload = "héllo — café … € ¡!"
      Warc.write(Seq(("https://a.com/u", payload)).toDF("url", "payload"),
        "url", "payload", dir + "_u", 1)
      Warc.read(spark, s"${dir}_u/part-*").collect()
        .head.payload shouldBe payload
    }
  }

  describe("Warc.parse hardening") {
    it("raises on a truncated payload rather than dropping it") {
      val bytes = ("WARC/1.0\r\nWARC-Target-URI: u\r\n" +
        "Content-Length: 100\r\n\r\nshort").getBytes(UTF_8)
      an[Exception] should be thrownBy Warc.parse("f", bytes)
    }

    it("raises on a record missing Content-Length") {
      val bytes = "WARC/1.0\r\nWARC-Target-URI: u\r\n\r\nxx".getBytes(UTF_8)
      an[Exception] should be thrownBy Warc.parse("f", bytes)
    }

    it("ignores leading junk before the first record") {
      val bytes = ("garbage\n" +
        "WARC/1.0\r\nWARC-Target-URI: u\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
        .getBytes(UTF_8)
      Warc.parse("f", bytes).map(r => (r.url, r.payload)) shouldBe
        Seq(("u", "hi"))
    }
  }
}

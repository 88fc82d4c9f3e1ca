package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingest — the container every
  * web-scale training corpus actually arrives in (Common Crawl
  * publishes WARC; C4/RefinedWeb/FineWeb all start by reading it).
  * Covered subset: WARC/1.0 `response` records with
  * `WARC-Target-URI` and `Content-Length` headers — the fields a
  * text pipeline needs; gzip-per-record transport is a codec knob
  * away (zero-egress container ships no gzip-member test data).
  *
  * Read shape: `binaryFile` source → one parse task per WARC file —
  * exactly how production WARC readers distribute (a crawl dump is
  * tens of thousands of ~1 GB files; per-file parallelism saturates
  * any cluster). Parsing is imperative byte scanning driven by
  * Content-Length (NOT delimiter splitting — payloads may contain
  * anything, including "WARC/1.0"), which is precisely the
  * per-partition logic Catalyst expressions cannot express — the
  * documented mapPartitions-family exception (same as q33's media
  * decode).
  */
object Warc {

  final case class Record(file: String, url: String, payload: String)

  /** Serialize (url, payload) rows as WARC/1.0 response records into
    * `shards` text files. Content-Length counts payload BYTES
    * (UTF-8), per the spec. One exchange (the repartition to shard
    * count); record assembly is a codegen'd projection.
    */
  def write(df: DataFrame, urlCol: String, payloadCol: String,
      path: String, shards: Int): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    df.select(concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        col(urlCol),
        lit("\r\nContent-Length: "),
        octet_length(col(payloadCol)).cast("string"),
        lit("\r\n\r\n"),
        col(payloadCol),
        lit("\r\n\r\n")).as("value"))
      .repartition(shards)
      .write.mode("overwrite").text(path)
  }

  private val Magic = "WARC/1.0".getBytes(UTF_8)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Parse one WARC file's bytes into records. Malformed tails
    * (truncated record, missing mandatory header) raise — a corrupt
    * crawl shard should fail loudly, not silently drop pages.
    */
  private[sources] def parse(file: String, bytes: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    val headerEndMark = "\r\n\r\n".getBytes(UTF_8)
    var pos = indexOf(bytes, Magic, 0)
    while (pos >= 0) {
      val headerEnd = indexOf(bytes, headerEndMark, pos)
      require(headerEnd > pos, s"$file: unterminated WARC header at $pos")
      val header = new String(bytes, pos, headerEnd - pos, UTF_8)
      val fields = header.split("\r\n").drop(1).iterator.map { line =>
        val i = line.indexOf(':')
        require(i > 0, s"$file: malformed header line '$line'")
        line.substring(0, i).toLowerCase -> line.substring(i + 1).trim
      }.toMap
      val len = fields.getOrElse("content-length",
        sys.error(s"$file: record at $pos missing Content-Length")).toInt
      val url = fields.getOrElse("warc-target-uri",
        sys.error(s"$file: record at $pos missing WARC-Target-URI"))
      val payloadStart = headerEnd + headerEndMark.length
      require(payloadStart + len <= bytes.length,
        s"$file: truncated payload at $pos")
      out += Record(file, url,
        new String(bytes, payloadStart, len, UTF_8))
      pos = indexOf(bytes, Magic, payloadStart + len)
    }
    out.result()
  }

  /** Distributed WARC read: one parse task per file. */
  def read(spark: SparkSession, glob: String): Dataset[Record] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) => parse(p, b) }
  }
}

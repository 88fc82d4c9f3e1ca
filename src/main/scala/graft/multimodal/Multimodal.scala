package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media ride along as opaque `binary`
  * columns with typed metadata, and decode/feature-extraction runs as
  * a BATCHED per-partition operator — the Scala shape of PySpark's
  * `mapInPandas` (iterator of batches in, iterator of batches out).
  *
  * The header decode is REAL: `MediaCodec` parses JPEG SOF markers,
  * PNG IHDR chunks (CRC-checked), WAV RIFF/fmt chunks, and MP4
  * ISO-BMFF boxes, emitting genuine width/height/frame/sample-rate
  * metadata from the payload bytes. `featureBatches` computes a real
  * content-derived descriptor (L2-normalized folded byte-bigram
  * histogram); a learned embedding model would drop into the same
  * batched operator. What matters at 100 TB holds
  * throughout: decode cost scales with executors, and the payload
  * bytes never shuffle — all derivations are per-row; only compact
  * metadata aggregates move.
  */
object Multimodal {

  val MimeTypes: Seq[String] =
    Seq("image/jpeg", "image/png", "audio/wav", "video/mp4")

  /** Every synthesized payload is padded to this size, so corpus
    * bytes are a pure function of asset count (and the parsers get
    * exercised against trailing padding, which real sidecar-upload
    * pipelines see too).
    */
  val PaddedSize = 256

  // deterministic per-asset properties, derived from the id — the
  // SAME formulas appear in the q33 oracle SQL, which recomputes the
  // expected metadata that decode must recover from the actual bytes
  private[graft] def synthW(id: Long): Int = (64 + (id * 7) % 448).toInt
  private[graft] def synthH(id: Long): Int = (64 + (id * 13) % 448).toInt
  private[graft] def synthRate(id: Long): Int =
    Seq(8000, 16000, 44100)((id % 3).toInt)
  private[graft] def synthFrames(id: Long): Int = (1 + id % 300).toInt

  /** Attach a real synthesized media payload to each row: a VALID
    * minimal JPEG/PNG/WAV/MP4 container (see MediaCodec) whose
    * dimensions derive deterministically from the id. This stands in
    * for reading sidecar media files next to the text corpus; the
    * schema contract (binary payload + mime + typed metadata) is what
    * a real ingest produces.
    */
  def synthesizeAssets(docs: DataFrame, idCol: String): DataFrame = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val mimes = MimeTypes // avoid closing over `this`
    val out = ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val mime = mimes(java.lang.Math.floorMod(id, 4L).toInt)
        val raw = mime match {
          case "image/jpeg" => MediaCodec.synthesizeJpeg(synthW(id), synthH(id))
          case "image/png"  => MediaCodec.synthesizePng(synthW(id), synthH(id))
          case "audio/wav"  => MediaCodec.synthesizeWav(synthRate(id))
          case "video/mp4"  =>
            MediaCodec.synthesizeMp4(synthW(id), synthH(id), synthFrames(id))
        }
        require(raw.length <= PaddedSize,
          s"synthesized $mime payload ${raw.length}B exceeds $PaddedSize")
        Row(id, mime, java.util.Arrays.copyOf(raw, PaddedSize))
      }
    }(Encoders.row(schema))
    out
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .withColumn("checksum", xxhash64(col("payload")))
  }

  val DecodedType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** Batched decode: partitions stream through in `batchSize` groups
    * (the mapInPandas batch shape — a codec amortizes setup per
    * batch). The parse is real header decoding (MediaCodec); a
    * malformed payload decodes to an all-null struct instead of
    * failing the job — corpus-scale decode quarantines, it doesn't
    * die.
    */
  def decodeBatches(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField("decoded", DecodedType))
    val mimeIdx = df.schema.fieldIndex("mime")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val decoded =
            MediaCodec.parse(r.getString(mimeIdx), r.getAs[Array[Byte]](payloadIdx))
              .map(m => Row(m.width.map(Int.box).orNull,
                m.height.map(Int.box).orNull,
                m.nFrames.map(Int.box).orNull,
                m.sampleRate.map(Int.box).orNull))
              .getOrElse(Row(null, null, null, null))
          Row.fromSeq(r.toSeq :+ decoded)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling over decoded video assets: every `everyN`-th
    * frame index becomes a row, carrying a deterministic per-frame
    * checksum (stand-in for the frame bytes a pixel decoder would
    * emit). Pure per-row sequence+explode — a 10⁹-video corpus fans
    * out to frame rows with zero shuffle; downstream feature
    * extraction joins on (doc_id, frame_idx).
    */
  def sampleFrames(decoded: DataFrame, everyN: Int): DataFrame = {
    require(everyN >= 1, "everyN must be >= 1")
    decoded
      .filter(col("decoded.n_frames") > 1)
      .select(col("doc_id"), col("mime"),
        explode(sequence(lit(0), col("decoded.n_frames") - 1, lit(everyN)))
          .as("frame_idx"))
      .withColumn("frame_checksum", xxhash64(col("doc_id"), col("frame_idx")))
  }

  /** Resize planning over decoded visual assets: target box fit with
    * aspect preserved (the real computation — only the pixel
    * resampling itself would live in a pixel codec). Pure per-row
    * arithmetic on the decoded metadata; audio rows pass through with
    * null targets.
    */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val w = col("decoded.width")
    val h = col("decoded.height")
    val scale = least(lit(maxSide) / greatest(w, h).cast("double"), lit(1.0))
    decoded
      .withColumn("target_w",
        when(w.isNotNull, floor(w * scale).cast("int")))
      .withColumn("target_h",
        when(h.isNotNull, floor(h * scale).cast("int")))
  }

  /** Batched feature extraction: a REAL content-derived descriptor —
    * the L2-normalized folded byte-BIGRAM histogram of the payload
    * (the classic content-based-retrieval baseline: n-gram histogram
    * features, here over raw bytes so it works for any mime type).
    * Each adjacent byte pair hashes (Fibonacci multiplier) into one of
    * `dim` buckets; the normalized bucket counts are the vector.
    * Identical payloads ⇒ identical vectors; payloads with similar
    * byte-pair distributions ⇒ high cosine — exactly the contract
    * graft.ann / graft.dedup.embeddingPairs need downstream. A model
    * embedding drops in by replacing the histogram body; the batch
    * shape (mapInPandas-style grouped iterator) is what it would run
    * over.
    */
  def featureBatches(df: DataFrame, dim: Int = 8, batchSize: Int = 64): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    val outSchema = df.schema.add(
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batched so a heavier extractor (pixel codec, model) amortizes
        // per-batch setup; the histogram itself is one pass over bytes
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](payloadIdx)
          val counts = new Array[Long](dim)
          var i = 0
          while (i + 1 < bytes.length) {
            val pair = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
            // Fibonacci-hash fold of the 16-bit pair into dim buckets
            val h = (pair * 0x9E3779B9) >>> 16
            counts(h % dim) += 1
            i += 1
          }
          val norm = math.sqrt(counts.map(c => c.toDouble * c).sum)
          val vec =
            if (norm == 0.0) Array.fill(dim)(0f)
            else counts.map(c => (c / norm).toFloat)
          Row.fromSeq(r.toSeq :+ vec.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Metadata summary per mime type — the catalog-facing view. */
  def metaSummary(decoded: DataFrame): DataFrame =
    decoded.groupBy(col("mime"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("byte_len")).as("total_bytes"),
        min(col("decoded.width")).as("min_width"),
        max(col("decoded.width")).as("max_width"),
        max(col("decoded.n_frames")).as("max_frames"),
        max(col("decoded.sample_rate")).as("max_sample_rate"))
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media ride along as opaque `binary`
  * columns with typed metadata, and decode/feature-extraction runs as
  * a BATCHED per-partition operator — the Scala shape of PySpark's
  * `mapInPandas` (iterator of batches in, iterator of batches out),
  * which is where a real image/audio codec would be called.
  *
  * The decode itself is a clearly-marked STUB (this environment ships
  * no media libraries): it derives deterministic fake dimensions from
  * the payload checksum. Everything around it — the schema contract,
  * the binary payload column, the batch iteration, the partition
  * parallelism — is real and is what matters at 100 TB: decode cost
  * scales with executors, and the payload bytes never shuffle (all
  * derivations are per-row; only compact metadata aggregates move).
  */
object Multimodal {

  val MimeTypes: Seq[String] = Seq("image/jpeg", "audio/wav", "video/mp4")

  /** Attach a binary payload + typed metadata to a text corpus (the
    * testdata has no real media, so the payload is the utf-8 bytes —
    * the plumbing is identical for real image bytes).
    */
  def attachBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      element_at(typedlit(MimeTypes), (pmod(col(idCol), lit(3)) + 1).cast("int"))
        .as("mime"),
      octet_length(col(textCol)).cast("long").as("byte_len"),
      xxhash64(col(textCol)).as("checksum"))

  val DecodedType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** Batched decode: partitions stream through in `batchSize` groups
    * (the mapInPandas batch shape — a real codec amortizes setup per
    * batch). STUB: dimensions are derived deterministically from the
    * checksum instead of decoding bytes.
    */
  def decodeBatches(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField("decoded", DecodedType))
    val mimeIdx = df.schema.fieldIndex("mime")
    val checksumIdx = df.schema.fieldIndex("checksum")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // >>> STUB decode: a real implementation hands `batch`'s
        // payload bytes to a native decoder here and reads back real
        // width/height/frames/sample_rate. Fake values are pure
        // functions of the checksum so runs are reproducible. <<<
        batch.map { r =>
          val mime = r.getString(mimeIdx)
          val cs = r.getLong(checksumIdx)
          def d(mod: Int, off: Int): Int = (Math.floorMod(cs, mod) + off).toInt
          val decoded = mime match {
            case "image/jpeg" => Row(d(448, 64), d(448, 64), 1, null)
            case "audio/wav"  => Row(null, null, 1, Seq(8000, 16000, 44100)(d(3, 0)))
            case "video/mp4"  => Row(d(448, 64), d(448, 64), d(300, 1), null)
            case _            => Row(null, null, null, null)
          }
          Row.fromSeq(r.toSeq :+ decoded)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling over decoded video assets: every `everyN`-th
    * frame index becomes a row, carrying a deterministic per-frame
    * checksum (stub for the frame bytes a real decoder would emit).
    * Pure per-row sequence+explode — a 10⁹-video corpus fans out to
    * frame rows with zero shuffle; downstream feature extraction
    * joins on (doc_id, frame_idx).
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
    * resampling itself would live in the stubbed codec). Pure per-row
    * arithmetic on the decoded metadata; audio rows pass through with
    * null targets.
    */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = col("decoded.width")
    val h = col("decoded.height")
    val scale = least(lit(maxSide) / greatest(w, h).cast("double"), lit(1.0))
    decoded
      .withColumn("target_w",
        when(w.isNotNull, floor(w * scale).cast("int")))
      .withColumn("target_h",
        when(h.isNotNull, floor(h * scale).cast("int")))
  }

  /** Batched feature extraction STUB: emits a deterministic
    * `dim`-float vector per asset (derived from the checksum — a real
    * implementation hands the batch to an embedding model here). The
    * batch shape mirrors decodeBatches; the output column plugs
    * directly into graft.ann / graft.dedup.embeddingPairs.
    */
  def featureBatches(df: DataFrame, dim: Int = 8, batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val checksumIdx = df.schema.fieldIndex("checksum")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // >>> STUB embed: real code runs the batch through a model <<<
        batch.map { r =>
          val cs = r.getLong(checksumIdx)
          val vec = Array.tabulate(dim) { i =>
            // splitmix-ish per-slot mix of the checksum — deterministic
            val z = (cs + 0x9e3779b97f4a7c15L * (i + 1))
            val m = (z ^ (z >>> 31)) * 0xbf58476d1ce4e5b9L
            ((m >>> 11).toDouble / (1L << 53).toDouble).toFloat
          }
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

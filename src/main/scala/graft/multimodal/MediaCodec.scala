package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media container codecs: synthesize minimal VALID files
  * and parse their headers back — JPEG (SOI/SOF0 marker walk), PNG
  * (IHDR chunk, CRC32-correct), WAV (RIFF/fmt chunk walk), MP4
  * (ISO-BMFF box walk: moov/mvhd + trak/tkhd).
  *
  * This is the real decode core of the multimodal pipeline (reference
  * `services/file_upload_service.py` ingests uploads by content type;
  * the LLM-pipeline family extends it to media metadata extraction).
  * Pixel/sample decoding would need a native codec library (absent in
  * this environment); header parsing — dimensions, sample rate, frame
  * counts — is what drives partitioning, resize planning, and frame
  * sampling at 100 TB, and is fully implemented here.
  *
  * Parsers are defensive: they return None instead of throwing on
  * malformed bytes (a corpus-scale decode job must quarantine bad
  * assets, not die), and tolerate trailing padding after the
  * container's own end marker.
  */
object MediaCodec {

  final case class Meta(
      width: Option[Int],
      height: Option[Int],
      nFrames: Option[Int],
      sampleRate: Option[Int])

  // ---------------------------------------------------------------
  // JPEG: SOI, SOF0 (baseline frame header carrying height/width),
  // EOI. Marker walk per ITU T.81 §B.
  // ---------------------------------------------------------------

  def synthesizeJpeg(width: Int, height: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0xFF, 0xD8).map(_.toByte)) // SOI
    // SOF0: marker, length=11 (1 component), precision 8, H, W, 1 comp
    out.write(Array(0xFF, 0xC0, 0x00, 0x0B, 0x08).map(_.toByte))
    out.write(be16(height)); out.write(be16(width))
    out.write(Array(0x01, 0x01, 0x11, 0x00).map(_.toByte))
    out.write(Array(0xFF, 0xD9).map(_.toByte)) // EOI
    out.toByteArray
  }

  def parseJpeg(bytes: Array[Byte]): Option[Meta] = {
    if (bytes.length < 4 || u8(bytes, 0) != 0xFF || u8(bytes, 1) != 0xD8)
      return None
    var i = 2
    while (i + 4 <= bytes.length && u8(bytes, i) == 0xFF) {
      val marker = u8(bytes, i + 1)
      if (marker == 0xD9) return None // EOI before any SOF
      // SOFn frame headers are C0–CF minus DHT (C4), JPG (C8), DAC (CC)
      if (marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
        if (i + 9 > bytes.length) return None
        return Some(Meta(Some(be16(bytes, i + 7)), Some(be16(bytes, i + 5)),
          Some(1), None))
      }
      i += 2 + be16(bytes, i + 2) // marker + its length-prefixed segment
    }
    None
  }

  // ---------------------------------------------------------------
  // PNG: signature + IHDR (width/height big-endian) + IEND, chunk
  // CRCs computed for real (java.util.zip.CRC32 over type+data).
  // ---------------------------------------------------------------

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  def synthesizePng(width: Int, height: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte).put(0.toByte) // bit depth 8, greyscale
      .put(0.toByte).put(0.toByte).put(0.toByte)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    out.write(be32(data.length))
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    out.write(be32(crc.getValue.toInt))
  }

  def parsePng(bytes: Array[Byte]): Option[Meta] = {
    if (bytes.length < 33 || !bytes.take(8).sameElements(PngSig)) return None
    // first chunk must be IHDR
    if (new String(bytes.slice(12, 16), "US-ASCII") != "IHDR") return None
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 12, 4 + 13)
    if (crc.getValue.toInt != be32(bytes, 29)) return None // corrupt header
    Some(Meta(Some(be32(bytes, 16)), Some(be32(bytes, 20)), Some(1), None))
  }

  // ---------------------------------------------------------------
  // PNG with REAL pixel data: greyscale 8-bit, one IDAT chunk whose
  // zlib stream actually inflates (java.util.zip) to filtered
  // scanlines (filter 0). This is the decodable-image path the
  // perceptual-hash dedup (q145) runs on.
  // ---------------------------------------------------------------

  /** A square greyscale 8-bit PNG carrying `pixels` (row-major,
    * values 0..255; length must be a perfect square).
    */
  def synthesizePngGray(pixels: Array[Int]): Array[Byte] = {
    val side = math.sqrt(pixels.length.toDouble).toInt
    require(side * side == pixels.length,
      s"pixel count must be square, got ${pixels.length}")
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(side).putInt(side)
      .put(8.toByte).put(0.toByte) // bit depth 8, greyscale
      .put(0.toByte).put(0.toByte).put(0.toByte)
    writeChunk(out, "IHDR", ihdr.array())
    val raw = new Array[Byte](side * (side + 1)) // filter byte + row
    var r = 0
    while (r < side) {
      raw(r * (side + 1)) = 0 // filter type 0 (None)
      var c = 0
      while (c < side) {
        raw(r * (side + 1) + 1 + c) = pixels(r * side + c).toByte
        c += 1
      }
      r += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    // drain until finished: a single deflate() call into a fixed
    // buffer silently truncates once the stream outgrows it
    // (incompressible pixels exceed raw.length past ~500×500)
    val zipped = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zipped.write(buf, 0, n)
    }
    deflater.end()
    writeChunk(out, "IDAT", zipped.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a greyscale-8 PNG produced by any writer using filter-0
    * scanlines: chunk walk, IHDR shape check, inflate concatenated
    * IDATs, strip per-row filter bytes. None on anything malformed
    * (quarantine, don't throw — corpus-decode contract).
    */
  def parsePngGray(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes.length < 33 || !bytes.take(8).sameElements(PngSig)) return None
    if (new String(bytes.slice(12, 16), "US-ASCII") != "IHDR") return None
    val w = be32(bytes, 16); val h = be32(bytes, 20)
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return None
    if (u8(bytes, 24) != 8 || u8(bytes, 25) != 0) return None // depth 8 grey
    val idat = new ByteArrayOutputStream()
    var i = 8
    while (i + 8 <= bytes.length) {
      val len = be32(bytes, i)
      val typ = new String(bytes.slice(i + 4, i + 8), "US-ASCII")
      if (len < 0 || i + 12 + len > bytes.length) return None
      if (typ == "IDAT") idat.write(bytes, i + 8, len)
      if (typ == "IEND") i = bytes.length
      else i += 12 + len
    }
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (w + 1))
    try {
      val n = inflater.inflate(raw)
      if (n != raw.length || !inflater.finished()) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    val px = new Array[Int](w * h)
    var r = 0
    while (r < h) {
      if (raw(r * (w + 1)) != 0) return None // only filter 0 supported
      var c = 0
      while (c < w) {
        px(r * w + c) = raw(r * (w + 1) + 1 + c) & 0xFF
        c += 1
      }
      r += 1
    }
    Some(px)
  }

  // ---------------------------------------------------------------
  // WAV: RIFF/WAVE with a PCM fmt chunk; sample rate little-endian.
  // ---------------------------------------------------------------

  def synthesizeWav(sampleRate: Int, nSampleBytes: Int = 0): Array[Byte] = {
    val b = ByteBuffer.allocate(44 + nSampleBytes).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSampleBytes)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1) // PCM, mono
    b.putInt(sampleRate).putInt(sampleRate * 2) // byte rate: 16-bit mono
    b.putShort(2).putShort(16) // block align, bits/sample
    b.put("data".getBytes("US-ASCII")).putInt(nSampleBytes)
    b.array()
  }

  /** WAV with REAL 16-bit little-endian mono PCM samples — the
    * decodable-audio path (q153's perceptual audio near-dup).
    */
  def synthesizeWavPcm16(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val data = ByteBuffer.allocate(samples.length * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => data.putShort(s.toShort))
    val head = synthesizeWav(sampleRate, samples.length * 2)
    // synthesizeWav reserves the data region zero-filled; splice in
    System.arraycopy(data.array(), 0, head, 44, samples.length * 2)
    head
  }

  /** Decode the data chunk of a PCM-16 mono WAV back to samples;
    * None on anything malformed or non-PCM16-mono (quarantine).
    */
  def parseWavPcm16(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes.length < 44 ||
        new String(bytes.slice(0, 4), "US-ASCII") != "RIFF" ||
        new String(bytes.slice(8, 12), "US-ASCII") != "WAVE") return None
    val riffEnd = math.min(8L + le32(bytes, 4), bytes.length.toLong).toInt
    var fmtOk = false
    var i = 12
    while (i + 8 <= riffEnd) {
      val id = new String(bytes.slice(i, i + 4), "US-ASCII")
      val sz = le32(bytes, i + 4)
      if (sz < 0 || i + 8 + sz > bytes.length) return None
      if (id == "fmt ") {
        if (sz < 16) return None
        val codec = le16(bytes, i + 8)
        val channels = le16(bytes, i + 10)
        val bits = le16(bytes, i + 22)
        if (codec != 1 || channels != 1 || bits != 16) return None
        fmtOk = true
      } else if (id == "data") {
        if (!fmtOk || (sz & 1) == 1) return None // fmt must precede data
        val out = new Array[Int](sz / 2)
        var j = 0
        while (j < out.length) {
          val lo = bytes(i + 8 + 2 * j) & 0xFF
          val hi = bytes(i + 8 + 2 * j + 1)
          out(j) = (hi << 8) | lo // sign from the high byte
          j += 1
        }
        return Some(out)
      }
      i += 8 + sz + (sz & 1)
    }
    None
  }

  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  def parseWav(bytes: Array[Byte]): Option[Meta] = {
    if (bytes.length < 36 ||
        new String(bytes.slice(0, 4), "US-ASCII") != "RIFF" ||
        new String(bytes.slice(8, 12), "US-ASCII") != "WAVE") return None
    val riffEnd = math.min(8L + le32(bytes, 4), bytes.length.toLong).toInt
    var i = 12
    while (i + 8 <= riffEnd) { // chunk walk within the RIFF bounds
      val id = new String(bytes.slice(i, i + 4), "US-ASCII")
      val sz = le32(bytes, i + 4)
      if (id == "fmt ") {
        if (i + 16 > bytes.length) return None
        return Some(Meta(None, None, Some(1), Some(le32(bytes, i + 12))))
      }
      i += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    None
  }

  // ---------------------------------------------------------------
  // MP4 (ISO-BMFF): ftyp + moov{mvhd, trak{tkhd}}. timescale is set
  // to the frame rate, so mvhd.duration counts frames; tkhd carries
  // width/height as 16.16 fixed point.
  // ---------------------------------------------------------------

  private val Fps = 30

  def synthesizeMp4(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val mvhd = ByteBuffer.allocate(108).order(ByteOrder.BIG_ENDIAN)
    mvhd.putInt(108).put("mvhd".getBytes("US-ASCII"))
    mvhd.putInt(0) // version 0 + flags
    mvhd.putInt(0).putInt(0) // ctime, mtime
    mvhd.putInt(Fps) // timescale = fps ⇒ duration counts frames
    mvhd.putInt(nFrames) // duration
    mvhd.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
    mvhd.position(mvhd.position() + 10) // reserved
    identityMatrix(mvhd)
    mvhd.position(mvhd.position() + 24) // pre_defined
    mvhd.putInt(2) // next track id

    val tkhd = ByteBuffer.allocate(92).order(ByteOrder.BIG_ENDIAN)
    tkhd.putInt(92).put("tkhd".getBytes("US-ASCII"))
    tkhd.putInt(7) // version 0, flags: enabled|in-movie|in-preview
    tkhd.putInt(0).putInt(0) // ctime, mtime
    tkhd.putInt(1).putInt(0) // track id, reserved
    tkhd.putInt(nFrames) // duration
    tkhd.position(tkhd.position() + 8) // reserved
    tkhd.putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, rsvd
    identityMatrix(tkhd)
    tkhd.putInt(width << 16).putInt(height << 16) // 16.16 fixed

    val trak = box("trak", tkhd.array())
    val moov = box("moov", mvhd.array() ++ trak)
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
    ftyp ++ moov
  }

  private def identityMatrix(b: ByteBuffer): Unit = {
    b.putInt(0x00010000).putInt(0).putInt(0)
    b.putInt(0).putInt(0x00010000).putInt(0)
    b.putInt(0).putInt(0).putInt(0x40000000)
  }

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
    b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
    b.array()
  }

  def parseMp4(bytes: Array[Byte]): Option[Meta] = {
    var width, height, frames = -1
    var timescale = 0
    def walk(from: Int, to: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val sz = be32(bytes, i)
        if (sz < 8 || i + sz > to) return // padding / malformed tail
        val typ = new String(bytes.slice(i + 4, i + 8), "US-ASCII")
        typ match {
          case "moov" | "trak" => walk(i + 8, i + sz)
          case "mvhd" if sz >= 28 && u8(bytes, i + 8) == 0 =>
            timescale = be32(bytes, i + 20)
            frames = be32(bytes, i + 24)
          case "tkhd" if sz >= 92 && u8(bytes, i + 8) == 0 =>
            width = be32(bytes, i + 84) >>> 16
            height = be32(bytes, i + 88) >>> 16
          case _ => ()
        }
        i += sz
      }
    }
    walk(0, bytes.length)
    if (frames < 0 || timescale <= 0) None
    // duration is in timescale units; timescale==Fps ⇒ frame count
    else Some(Meta(if (width >= 0) Some(width) else None,
      if (height >= 0) Some(height) else None,
      Some(frames * Fps / timescale), None))
  }

  // ---------------------------------------------------------------

  def parse(mime: String, bytes: Array[Byte]): Option[Meta] = mime match {
    case "image/jpeg" => parseJpeg(bytes)
    case "image/png"  => parsePng(bytes)
    case "audio/wav"  => parseWav(bytes)
    case "video/mp4"  => parseMp4(bytes)
    case _            => None
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
  private def be32(v: Int): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
}

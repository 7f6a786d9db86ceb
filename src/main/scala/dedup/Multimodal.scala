package dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Opaque-binary (multimodal) column handling: the `html: binary` payload
  * of the page table, and the general image/audio/video-as-bytes pattern a
  * training-data pipeline needs.
  *
  * The reference never parses HTML (inputs already carry extracted text —
  * SURVEY.md §1). Three tiers here, by how real they are in this sandbox:
  *   1. REAL byte-level parsing (no codec needed): magic sniffing
  *      [[sniffMagic]], image dimensions from PNG/GIF/BMP/JPEG headers
  *      [[imageDims]], WAV sample-rate/channels/duration [[wavMeta]].
  *   2. REAL Spark plumbing: schema, typed mapPartitions batching,
  *      null-safe metadata tables ([[describeBinary]], [[mediaMeta]]).
  *   3. STUB (clearly marked): pixel/sample DECODE ([[decodeStub]],
  *      [[sampleChunks]]) — actual media decoding needs codec libraries
  *      this container doesn't ship; a production deployment swaps these
  *      for codec calls with the same signatures.
  */
object Multimodal {

  /** Magic-byte content sniffing — pure byte inspection, no decoder. */
  def sniffMagic(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4) "empty"
    else if (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else if (bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F') "pdf"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "riff"
    else if (bytes(0) == 'B' && bytes(1) == 'M' && bytes.length >= 26) "bmp"
    else {
      val head = new String(bytes, 0, math.min(bytes.length, 64),
        java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
      if (head.contains("<html") || head.contains("<!doctype")) "html" else "bin"
    }
  }

  /** REAL image-dimension extraction by header parsing — pure byte
    * inspection, no codec (the container formats put dimensions at fixed
    * or marker-addressed offsets):
    *   PNG  — IHDR width/height, big-endian u32 at bytes 16/20 (spec §11.2.2)
    *   GIF  — logical screen descriptor, little-endian u16 at bytes 6/8
    *   BMP  — BITMAPINFOHEADER, little-endian i32 at bytes 18/22
    *   JPEG — scan segments for SOF0..SOF15 (not DHT/JPG/DAC), height/width
    *          big-endian u16 at marker+5/+7
    * Returns None for truncated or non-image bytes — never throws. */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null) return None
    def u8(i: Int) = bytes(i) & 0xFF
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = (u8(i + 1) << 8) | u8(i)
    def le32(i: Int) = (u8(i + 3) << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)
    sniffMagic(bytes) match {
      case "png" if bytes.length >= 24 && be32(12) == 0x49484452 => // "IHDR"
        Some((be32(16), be32(20)))
      case "gif" if bytes.length >= 10 =>
        Some((le16(6), le16(8)))
      case "bmp" if bytes.length >= 26 =>
        Some((le32(18), math.abs(le32(22)))) // height may be negative (top-down)
      case "jpeg" =>
        // walk the segment chain: FF marker, 2-byte big-endian length
        var i = 2
        while (i + 9 < bytes.length) {
          if (u8(i) != 0xFF) return None // lost sync
          var m = u8(i + 1)
          var j = i + 1
          while (m == 0xFF && j + 1 < bytes.length) { j += 1; m = u8(j) } // fill bytes
          val seg = j + 1
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            if (seg + 7 < bytes.length) return Some((be16(seg + 5), be16(seg + 3)))
            return None
          }
          if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) i = seg // no-length markers
          else if (m == 0xD9 || m == 0xDA) return None       // EOI / entropy data
          else {
            if (seg + 1 >= bytes.length) return None
            i = seg + be16(seg)
          }
        }
        None
      case _ => None
    }
  }

  /** Minimal valid PNG signature + IHDR chunk for (w, h) — the test/
    * fixture constructor dual of [[imageDims]]. Byte layout per the PNG
    * spec (§5.2 signature, §11.2.2 IHDR); the suite pins BOTH sides
    * independently: the parser against hand-built golden bytes, this
    * constructor against a byte-offset golden, so a symmetric
    * endianness bug in the pair cannot self-verify. */
  def pngHeader(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](25)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    System.arraycopy(sig, 0, out, 0, 8)
    def putBe32(off: Int, v: Int): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    putBe32(8, 13) // IHDR data length
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    putBe32(16, w)
    putBe32(20, h)
    out(24) = 8 // bit depth (truncated chunk: enough for header parsing)
    out
  }

  /** REAL WAV (RIFF) audio metadata by chunk-walk — no codec:
    * (sampleRate, channels, bitsPerSample, durationMs). The fmt chunk
    * carries the format fields; duration = data-chunk bytes / byteRate. */
  def wavMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (bytes == null || bytes.length < 44 || sniffMagic(bytes) != "riff") return None
    def u8(i: Int) = bytes(i) & 0xFF
    def le16(i: Int) = (u8(i + 1) << 8) | u8(i)
    def le32(i: Int) = ((u8(i + 3) << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)).toLong & 0xFFFFFFFFL
    def tag(i: Int) = new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(8) != "WAVE") return None
    var i = 12
    var rate = 0; var ch = 0; var bits = 0; var byteRate = 0L; var dataLen = -1L
    while (i + 8 <= bytes.length) {
      val id = tag(i); val size = le32(i + 4)
      if (id == "fmt " && i + 24 <= bytes.length) {
        ch = le16(i + 10); rate = le32(i + 12).toInt
        byteRate = le32(i + 16); bits = le16(i + 22)
      } else if (id == "data") {
        dataLen = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (rate <= 0 || ch <= 0 || dataLen < 0) None
    else Some((rate, ch, bits, if (byteRate > 0) dataLen * 1000L / byteRate else 0L))
  }

  /** STUB decode + feature-extract: a deterministic 16-dim byte-histogram
    * "embedding" standing in for a real image/audio feature extractor (no
    * media libs in this container). Batch shape, schema and partitioning
    * are the real contract; only the math inside is fake. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (bytes == null || bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xF0) >>> 4) += 1f
      i += 1
    }
    var j = 0
    while (j < 16) { hist(j) /= bytes.length; j += 1 }
    hist
  }

  /** STUB frame-sampler: every `stride`-th fixed-size chunk of a media
    * blob (stands in for video frame extraction; bounds output size the
    * way a real sampler bounds frames). */
  def sampleChunks(bytes: Array[Byte], chunk: Int, stride: Int): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < chunk) Seq.empty
    else (0 to (bytes.length - chunk) by (chunk * stride))
      .map(off => java.util.Arrays.copyOfRange(bytes, off, off + chunk))
  }

  /** Per-row binary metadata + stub features, as one typed mapPartitions
    * pass (one decode per blob; no per-column recompute). */
  def describeBinary(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bin) =>
          val n = if (bin == null) 0L else bin.length.toLong
          (id, n, sniffMagic(bin), decodeStub(bin))
        }
      }
      .toDF("id", "n_bytes", "magic", "features")
  }

  /** Typed media-metadata table from an opaque binary column — REAL header
    * parsing (imageDims / wavMeta), one pass, null-safe: non-media or
    * truncated blobs yield null metadata columns, never a task failure. */
  def mediaMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bin) =>
          val n = if (bin == null) 0L else bin.length.toLong
          val kind = sniffMagic(bin)
          val img = imageDims(bin)
          val wav = wavMeta(bin)
          (id, n, kind,
            img.map(_._1), img.map(_._2),
            wav.map(_._1), wav.map(_._2), wav.map(_._4))
        }
      }
      .toDF("id", "n_bytes", "magic", "width", "height",
        "sample_rate", "channels", "duration_ms")
  }
}

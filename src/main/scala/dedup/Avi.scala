package dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL video frame decode — for the one video wire format whose frames
  * need no stream codec: MJPEG in AVI, where every `00dc` chunk of the
  * RIFF `movi` list is a complete baseline JPEG image ([[Jpeg.decode]]
  * handles those since round 4). This upgrades the video boundary from
  * header-parse-only ([[Multimodal.mp4Meta]]/`webmMeta`) and the
  * `sampleChunks` byte-stub to actual sampled-frame rasters, and gives
  * video near-dup dedup real eyes: per-frame perceptual dHash, folded
  * into one 64-bit video fingerprint, banded through the same SimHash
  * pigeonhole machinery as images and audio.
  *
  * AVI is plain RIFF (the WAV container with a different type tag):
  * little-endian chunk walks, no compression in the container itself.
  * H.264/VP9-in-MP4/WebM stay honestly out of scope — those frames
  * genuinely need stream codecs.
  *
  * Reference shape: the reference toolkit never touches video — new
  * capability, same boundary honesty as [[Jpeg]]/[[Flac]].
  */
object Avi {

  private def le16(b: Array[Byte], i: Int) = ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)
  private def le32(b: Array[Byte], i: Int): Long =
    (((b(i + 3) & 0xFF).toLong << 24) | ((b(i + 2) & 0xFF) << 16) |
      ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)) & 0xFFFFFFFFL
  private def tag(b: Array[Byte], i: Int) =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** AVI header parse: (width, height, usPerFrame, totalFrames, fourcc).
    * Walks RIFF-AVI → LIST hdrl → avih (+ strl/strh/strf for the codec
    * fourcc). None (never throws) for non-AVI or truncation. */
  def aviMeta(bytes: Array[Byte]): Option[(Int, Int, Long, Long, String)] = try {
    if (bytes == null || bytes.length < 24) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return None
    var w = 0; var h = 0; var usPf = 0L; var frames = 0L; var fourcc = ""
    def walk(from: Int, until: Int): Unit = {
      var i = from
      while (i + 8 <= until) {
        val id = tag(bytes, i)
        val size = le32(bytes, i + 4)
        val end = i + 8L + size
        if (end > until) return
        if (id == "LIST") walk(i + 12, end.toInt) // skip the list-type tag
        else if (id == "avih" && size >= 40) {
          usPf = le32(bytes, i + 8)
          frames = le32(bytes, i + 24)
          w = le32(bytes, i + 40).toInt
          h = le32(bytes, i + 44).toInt
        } else if (id == "strh" && size >= 16 && tag(bytes, i + 8) == "vids") {
          fourcc = tag(bytes, i + 12)
        }
        i = (end + (size & 1L)).toInt // chunks are word-aligned
      }
    }
    walk(12, bytes.length)
    if (w <= 0 || h <= 0) None else Some((w, h, usPf, frames, fourcc))
  } catch { case _: Throwable => None }

  /** Raw frame payloads from the movi list (video chunks `..dc`/`..db`),
    * capped at `maxFrames`. Empty for non-AVI — never throws. */
  def framePayloads(bytes: Array[Byte], maxFrames: Int = 256): Seq[Array[Byte]] = try {
    if (bytes == null || bytes.length < 24) return Seq.empty
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
      var i = from
      while (i + 8 <= until && out.length < maxFrames) {
        val id = tag(bytes, i)
        val size = le32(bytes, i + 4)
        val end = i + 8L + size
        if (end > until) return
        if (id == "LIST")
          walk(i + 12, end.toInt, inMovi || tag(bytes, i + 8) == "movi")
        else if (inMovi && size > 0 && id.length == 4 &&
                 (id.endsWith("dc") || id.endsWith("db")))
          out += java.util.Arrays.copyOfRange(bytes, i + 8, end.toInt)
        i = (end + (size & 1L)).toInt
      }
    }
    walk(12, bytes.length, inMovi = false)
    out.toSeq
  } catch { case _: Throwable => Seq.empty }

  /** A bare DIB frame (uncompressed `00db` chunk: BITMAPINFOHEADER +
    * pixels, NO 14-byte BMP file header) re-wrapped as a BMP file so
    * [[Multimodal.decodeBmp]]'s validated path decodes it — the data
    * offset accounts for the declared palette (biClrUsed × 4). None for
    * payloads that are not a 40-byte-header DIB. */
  private[dedup] def dibToBmp(p: Array[Byte]): Option[Array[Byte]] = {
    if (p == null || p.length < 40 || le32(p, 0) != 40L) return None
    val clrUsed = le32(p, 32)
    if (clrUsed > 256) return None
    val out = new Array[Byte](14 + p.length)
    out(0) = 'B'; out(1) = 'M'
    def putLe32(i: Int, v: Long): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    putLe32(2, out.length.toLong)
    putLe32(10, 14L + 40L + clrUsed * 4) // pixel data offset
    System.arraycopy(p, 0, out, 14, p.length)
    Some(out)
  }

  /** Decode every `stride`-th frame to (w, h, rgb) rasters — MJPEG
    * (`00dc` baseline JPEGs via [[Jpeg.decode]]) AND uncompressed DIB
    * (`00db` raw rasters via [[dibToBmp]] + the BMP decoder) — REAL
    * sampled-frame extraction (the contract `Multimodal.sampleChunks`
    * stubs for codec-bound containers). Undecodable frames are skipped,
    * never thrown. */
  def decodeFrames(
      bytes: Array[Byte], stride: Int = 1,
      maxFrames: Int = 64): Seq[(Int, Int, Array[Byte])] = {
    val step = math.max(1, stride)
    framePayloads(bytes, math.min(maxFrames.toLong * step, 4096L).toInt)
      .grouped(step).map(_.head).take(maxFrames)
      .flatMap(p => Multimodal.decodeImage(p)
        .orElse(dibToBmp(p).flatMap(Multimodal.decodeBmp)))
      .toSeq
  }

  /** 64-bit video fingerprint: per-frame perceptual dHash
    * ([[Multimodal.dHash]]), folded by PER-BIT MAJORITY vote across the
    * sampled frames (bit k set iff set in > half the decodable frames) —
    * integer-exact and replicable in SQL, robust to a few edited/
    * re-encoded frames the way dHash is robust to pixel noise. None if
    * no frame decodes. */
  def videoHash(bytes: Array[Byte], stride: Int = 1, maxFrames: Int = 64): Option[(Int, Long)] = {
    val hashes = decodeFrames(bytes, stride, maxFrames)
      .flatMap { case (w, h, rgb) => Multimodal.dHash(w, h, rgb) }
    if (hashes.isEmpty) return None
    var fp = 0L
    var k = 0
    while (k < 64) {
      var set = 0
      hashes.foreach(hh => if (((hh >>> k) & 1L) == 1L) set += 1)
      if (2 * set > hashes.length) fp |= 1L << k
      k += 1
    }
    Some((hashes.length, fp))
  }

  /** Binary video column → (id, n_frames, vfp) fingerprints, one typed
    * mapPartitions pass (decode once per blob; zero shuffle). Undecodable
    * blobs yield null counts/hash — kept, never a task failure (the
    * [[Multimodal.mediaMeta]] contract). */
  def videoFingerprint(
      df: DataFrame, idCol: String, binCol: String,
      stride: Int = 1, maxFrames: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bin) =>
          videoHash(bin, stride, maxFrames) match {
            case Some((n, fp)) => (id, Some(n.toLong), Some(fp))
            case None => (id, None, None)
          }
        }
      }
      .toDF("id", "n_frames", "vfp")
  }

  /** Video near-dup edges: [[videoFingerprint]] output through the shared
    * SimHash pigeonhole banding ([[Multimodal.fingerprintNearDupEdges]]). */
  def videoNearDupEdges(hashes: DataFrame, cfg: DedupConfig): DataFrame =
    Multimodal.fingerprintNearDupEdges(hashes, "vfp", cfg)

  // --------------------------------------------------------------- encode

  /** MJPEG AVI writer — fixture dual of the reader (the
    * [[Multimodal.encodeBmp]] pattern: synthetic video whose frames have
    * integer-formula provenance). `frames` are complete JPEG blobs. */
  def encodeMjpeg(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] =
    encodeAvi(w, h, fps, frames, "MJPG", "00dc")

  /** Uncompressed-DIB AVI writer — the fixture dual of the `00db` decode
    * path: each frame is an RGB top-down raster, stored as the BMP
    * encoder's pixel layout minus the 14-byte file header (exactly what
    * real uncompressed AVIs carry). */
  def encodeDib(w: Int, h: Int, fps: Int, rgbFrames: Seq[Array[Byte]]): Array[Byte] =
    encodeAvi(w, h, fps,
      rgbFrames.map(f => Multimodal.encodeBmp(w, h, f).drop(14)), "DIB ", "00db")

  private def encodeAvi(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]],
      fourcc: String, chunkId: String): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0 && frames.nonEmpty, "bad avi args")
    val out = new java.io.ByteArrayOutputStream()
    def putLe32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >>> 8) & 0xFF).toInt)
      out.write(((v >>> 16) & 0xFF).toInt); out.write(((v >>> 24) & 0xFF).toInt)
    }
    def putTag(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0, 4)
    val maxFrame = frames.map(_.length).max
    // sizes: avih 56, strh 56, strf 40; lists add 12 (LIST + size + type)
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    putTag("RIFF"); putLe32(riffSize); putTag("AVI ")
    putTag("LIST"); putLe32(hdrlSize); putTag("hdrl")
    putTag("avih"); putLe32(56)
    putLe32(1000000L / fps) // microseconds per frame
    putLe32(maxFrame.toLong * fps) // max bytes/sec
    putLe32(0) // padding granularity
    putLe32(0) // flags: no idx1 index is written, so AVIF_HASINDEX stays off
    putLe32(frames.length) // total frames
    putLe32(0) // initial frames
    putLe32(1) // streams
    putLe32(maxFrame) // suggested buffer
    putLe32(w); putLe32(h)
    putLe32(0); putLe32(0); putLe32(0); putLe32(0) // reserved
    putTag("LIST"); putLe32(strlSize); putTag("strl")
    putTag("strh"); putLe32(56)
    putTag("vids"); putTag(fourcc)
    putLe32(0) // flags
    putLe32(0) // priority + language
    putLe32(0) // initial frames
    putLe32(1) // scale
    putLe32(fps) // rate (rate/scale = fps)
    putLe32(0) // start
    putLe32(frames.length) // length
    putLe32(maxFrame) // suggested buffer
    putLe32(0xFFFFFFFFL) // quality: default
    putLe32(0) // sample size (varies)
    putLe32(0); putLe32((h << 16) | w) // rcFrame (left/top, right/bottom)
    putTag("strf"); putLe32(40)
    putLe32(40); putLe32(w); putLe32(h)
    putLe32((24 << 16) | 1) // planes=1, bitcount=24
    putTag(fourcc)
    putLe32(w.toLong * h * 3) // sizeImage
    putLe32(0); putLe32(0); putLe32(0); putLe32(0) // ppm + colors
    putTag("LIST"); putLe32(moviSize); putTag("movi")
    frames.foreach { f =>
      putTag(chunkId); putLe32(f.length)
      out.write(f, 0, f.length)
      if ((f.length & 1) == 1) out.write(0) // word alignment
    }
    out.toByteArray
  }
}

package dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Opaque-binary (multimodal) column handling: the `html: binary` payload
  * of the page table, and the general image/audio/video-as-bytes pattern a
  * training-data pipeline needs.
  *
  * The reference never parses HTML (inputs already carry extracted text —
  * SURVEY.md §1), and no media codecs ship in this sandbox, so the *decode*
  * step is a clearly-marked deterministic stand-in; everything Spark-side —
  * schema, typed mapPartitions batching, partition-friendly feature vectors
  * — is real and tested. A production deployment swaps `decodeStub` for a
  * codec call with the same signature.
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
    else {
      val head = new String(bytes, 0, math.min(bytes.length, 64),
        java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
      if (head.contains("<html") || head.contains("<!doctype")) "html" else "bin"
    }
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
}

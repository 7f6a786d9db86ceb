package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** MJPEG-AVI gates: container round-trip against our own writer, frame
  * rasters through the real JPEG decoder (lossless-corner frames so
  * pixels are exact), majority-vote video hash semantics, and the edge
  * contract (corrupt bytes, stride sampling, near-dup banding). */
class AviSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  /** Constant-8×8-block grayscale frame (JPEG lossless corner). */
  private def blockFrame(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val luma = Array.tabulate(w * h)(i => f((i % w) / 8, (i / w) / 8).toByte)
    Jpeg.encodeGray(w, h, luma, Jpeg.FlatQuant)
  }

  test("aviMeta and framePayloads round-trip the writer") {
    val frames = (0 until 5).map(f => blockFrame(24, 16, (bx, by) => (f * 50 + bx * 17 + by * 47) % 256))
    val avi = Avi.encodeMjpeg(24, 16, 10, frames)
    val Some((w, h, usPf, n, fourcc)) = Avi.aviMeta(avi)
    assert(w === 24 && h === 16 && usPf === 100000L && n === 5L && fourcc === "MJPG")
    val payloads = Avi.framePayloads(avi)
    assert(payloads.length === 5)
    assert(payloads.zip(frames).forall { case (a, b) => a.toSeq == b.toSeq })
  }

  test("decodeFrames: exact pixels through the jpeg lossless corner; stride sampling") {
    val vals = Seq(10, 60, 110, 160, 210, 250)
    val frames = vals.map(v => blockFrame(16, 16, (_, _) => v))
    val avi = Avi.encodeMjpeg(16, 16, 5, frames)
    val all = Avi.decodeFrames(avi)
    assert(all.length === 6)
    all.zip(vals).foreach { case ((w, h, rgb), v) =>
      assert(w === 16 && h === 16)
      assert(rgb.forall(b => (b & 0xFF) === v))
    }
    val sampled = Avi.decodeFrames(avi, stride = 2)
    assert(sampled.length === 3)
    assert(sampled.map(_._3(0) & 0xFF) === Seq(10, 110, 210))
    val capped = Avi.decodeFrames(avi, stride = 1, maxFrames = 2)
    assert(capped.length === 2)
  }

  test("videoHash: majority vote over per-frame dHash, hand-verified") {
    // three frames; frames 0 and 1 share a dHash, frame 2 differs ->
    // majority must equal the repeated frame's hash
    def frame(seed: Int): Array[Byte] = blockFrame(24, 16, (bx, by) => (seed * 31 + bx * 40 + by * 20) % 256)
    val a = frame(1); val b = frame(7)
    val avi = Avi.encodeMjpeg(24, 16, 5, Seq(a, a, b))
    val Some((w, h, rgbA)) = Multimodal.decodeImage(a)
    val hashA = Multimodal.dHash(w, h, rgbA).get
    val Some((wB, hB, rgbB)) = Multimodal.decodeImage(b)
    val hashB = Multimodal.dHash(wB, hB, rgbB).get
    assert(hashA !== hashB) // the vote is non-trivial
    val Some((n, fp)) = Avi.videoHash(avi)
    assert(n === 3)
    // per-bit majority of {A, A, B}: every bit where A and B agree is
    // theirs; where they differ, A wins 2-1 -> fp == hashA
    assert(fp === hashA)
  }

  test("videoFingerprint + videoNearDupEdges: copies collide, one-frame edit survives banding") {
    import spark.implicits._
    def mkVid(seed: Int, lastSeed: Int): Array[Byte] = {
      // bx*97 wraps mod 256 at different block columns per seed, so cell
      // orderings (hence dHash bits) genuinely differ between videos
      val f = (s: Int) => blockFrame(24, 16, (bx, by) => (s * 71 + bx * 97 + by * 53) % 256)
      Avi.encodeMjpeg(24, 16, 5, Seq(f(seed), f(seed), f(seed), f(lastSeed)))
    }
    val vids = Seq(
      (1L, mkVid(3, 3)), // original
      (2L, mkVid(3, 3)), // exact copy
      (3L, mkVid(3, 9)), // one frame swapped: majority hash identical
      (4L, mkVid(5, 5)), // different video
      (5L, "not a video".getBytes) // undecodable -> null row
    ).toDF("doc_id", "vid")
    val fps = Avi.videoFingerprint(vids, "doc_id", "vid")
    val rows = fps.collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(rows(5L) === None)
    assert(rows(1L) === rows(2L))
    assert(rows(1L) === rows(3L)) // majority absorbs the single edited frame
    assert(rows(1L) !== rows(4L))
    val edges = Avi.videoNearDupEdges(fps, DedupConfig(hammingK = 3))
      .select(least(col("src"), col("dst")), greatest(col("src"), col("dst")))
      .distinct().as[(Long, Long)].collect().toSet
    // star topology: the min-id rep links the salt group; (2,3) closes
    // via connected components, not as a direct edge
    assert(edges.contains((1L, 2L)) && edges.contains((1L, 3L)))
    assert(!edges.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("corrupt/truncated containers: empty or None, never a throw") {
    val frames = (0 until 3).map(f => blockFrame(16, 16, (_, _) => 40 * f + 20))
    val base = Avi.encodeMjpeg(16, 16, 5, frames)
    for (cut <- Seq(3, 11, 12, 40, base.length / 2, base.length - 1)) {
      val t = java.util.Arrays.copyOf(base, cut)
      Avi.aviMeta(t); Avi.framePayloads(t); Avi.videoHash(t) // no throw
    }
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 200) {
      val c = base.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Avi.videoHash(c) // no throw; corrupted frames skip (JPEG rejects)
    }
    assert(Avi.aviMeta(null).isEmpty)
    assert(Avi.framePayloads("RIFFxxxxWAVE".getBytes).isEmpty) // wav is not avi
    assert(Avi.videoHash(Array.emptyByteArray).isEmpty)
  }

  test("uncompressed DIB (00db) frames: exact pixels, no JPEG involved") {
    val w = 10; val h = 6
    def frame(seed: Int): Array[Byte] =
      Array.tabulate(w * h * 3)(i => ((seed * 31 + i * 7) % 256).toByte)
    val frames = Seq(frame(1), frame(2), frame(3))
    val avi = Avi.encodeDib(w, h, 10, frames)
    // metadata reflects the DIB fourcc
    val Some((mw, mh, _, nf, fourcc)) = Avi.aviMeta(avi)
    assert((mw, mh, nf, fourcc) === ((w, h, 3L, "DIB ")))
    // pixels come back EXACTLY (no DCT anywhere on this path)
    val dec = Avi.decodeFrames(avi)
    assert(dec.length === 3)
    for ((f, k) <- dec.zipWithIndex) {
      assert((f._1, f._2) === ((w, h)), s"frame $k dims")
      assert(f._3.toSeq === frames(k).toSeq, s"frame $k pixels")
    }
    // fingerprints work over DIB video; identical videos collide
    assert(Avi.videoHash(avi) === Avi.videoHash(Avi.encodeDib(w, h, 10, frames)))
    // a hostile palette count in a 00db payload rejects, never throws
    val bad = frame(1)
    val dib = Multimodal.encodeBmp(w, h, bad).drop(14)
    dib(32) = 0xFF.toByte; dib(33) = 0x7F.toByte // biClrUsed = 32767
    assert(Avi.dibToBmp(dib).isEmpty)
  }
}

package dedup

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec gates. Three independent truths triangulate the
  * implementation:
  *   1. algebra — constant 8×8 blocks are DC-only, so with a flat quant
  *      table the lossy pipeline has a LOSSLESS corner: round-trips must
  *      be bit-exact;
  *   2. self round-trips — general images must come back within the
  *      quantization error envelope;
  *   3. the JDK's own ImageIO JPEG codec (an independent implementation
  *      of ITU-T T.81, used in the TESTS ONLY — the engine path stays
  *      library-free): our decoder must agree with ImageIO's decoder on
  *      ImageIO-encoded bytes (which are 4:2:0-subsampled, exercising the
  *      MCU/upsampling path), and ImageIO must be able to read ours.
  */
class JpegSpec extends AnyFunSuite {

  private def grayFormula(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((seed * 31 + x * 7 + y * 13) % 256).toByte
    }

  private def rgbFormula(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { p =>
      val i = p / 3; val c = p % 3
      val x = i % w; val y = i / w
      ((seed * 29 + x * (3 + c * 2) + y * (5 + c)) % 256).toByte
    }

  private def maxDiff(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xFF) - (b(i) & 0xFF))
      if (d > m) m = d
      i += 1
    }
    m
  }

  private def meanDiff(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += math.abs((a(i) & 0xFF) - (b(i) & 0xFF)); i += 1 }
    s.toDouble / a.length
  }

  test("constant 8x8 blocks + flat quant: bit-exact round-trip (the lossless corner)") {
    val w = 24; val h = 16
    for (seed <- 0 until 8) {
      val luma = Array.tabulate(w * h) { i =>
        val bx = (i % w) / 8; val by = (i / w) / 8
        ((seed * 31 + bx * 17 + by * 47) % 256).toByte
      }
      val jpg = Jpeg.encodeGray(w, h, luma, Jpeg.FlatQuant)
      val Some((dw, dh, rgb)) = Jpeg.decode(jpg)
      assert(dw === w && dh === h)
      for (i <- 0 until w * h) {
        assert(rgb(i * 3) === luma(i), s"pixel $i seed $seed")
        assert(rgb(i * 3 + 1) === luma(i))
        assert(rgb(i * 3 + 2) === luma(i))
      }
    }
  }

  test("general grayscale + flat quant: round-trip within the rounding envelope") {
    val w = 33; val h = 25 // non-multiple-of-8: edge-padding path
    val luma = grayFormula(w, h, 3)
    val Some((dw, dh, rgb)) = Jpeg.decode(Jpeg.encodeGray(w, h, luma, Jpeg.FlatQuant))
    assert(dw === w && dh === h)
    val gray = Array.tabulate(w * h)(i => rgb(i * 3))
    // flat quant: per-coefficient error ≤ 0.5, worst-case pixel error small
    assert(maxDiff(gray, luma) <= 3)
    assert(meanDiff(gray, luma) <= 1.0)
  }

  test("general grayscale + standard tables: lossy but close") {
    val w = 40; val h = 32
    // smooth gradient: high quality should nearly recover it
    val luma = Array.tabulate(w * h)(i => ((i % w) * 3 + (i / w) * 2).toByte)
    val q = Jpeg.quantForQuality(Jpeg.StdLumQuant, 90)
    val Some((_, _, rgb)) = Jpeg.decode(Jpeg.encodeGray(w, h, luma, q))
    val gray = Array.tabulate(w * h)(i => rgb(i * 3))
    assert(meanDiff(gray, luma) <= 3.0)
  }

  test("restart intervals: DRI + RSTn round-trip bit-exactly on the lossless corner") {
    val w = 40; val h = 24 // 5x3 = 15 MCUs, interval 4 -> 3 RST markers
    val luma = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      ((bx * 53 + by * 11 + 7) % 256).toByte
    }
    val jpg = Jpeg.encodeGray(w, h, luma, Jpeg.FlatQuant, restartInterval = 4)
    // the wire really contains RST markers
    assert((0 until jpg.length - 1).exists(i =>
      (jpg(i) & 0xFF) == 0xFF && (jpg(i + 1) & 0xFF) >= 0xD0 && (jpg(i + 1) & 0xFF) <= 0xD7))
    val Some((dw, dh, rgb)) = Jpeg.decode(jpg)
    assert(dw === w && dh === h)
    for (i <- 0 until w * h) assert(rgb(i * 3) === luma(i))
  }

  test("color 4:4:4 round-trip within the color-conversion + quant envelope") {
    val w = 24; val h = 24
    val rgb = rgbFormula(w, h, 5)
    val Some((dw, dh, back)) =
      Jpeg.decode(Jpeg.encodeRgb(w, h, rgb, Jpeg.FlatQuant, Jpeg.FlatQuant))
    assert(dw === w && dh === h)
    // flat quant leaves only YCbCr<->RGB integer rounding (±2 per channel)
    // plus DCT rounding
    assert(maxDiff(back, rgb) <= 6)
    assert(meanDiff(back, rgb) <= 1.5)
  }

  // ---------------------------------------- ImageIO cross-validation

  private def imageioEncode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(p) & 0xFF) << 16) | ((rgb(p + 1) & 0xFF) << 8) | (rgb(p + 2) & 0xFF))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  /** Grayscale via raw raster samples — TYPE_BYTE_GRAY's LINEAR-gray
    * ColorSpace means setRGB/getRGB would insert an sRGB↔linear transfer
    * curve that is not part of the JPEG wire at all. */
  private def imageioEncodeGray(w: Int, h: Int, luma: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, luma(y * w + x) & 0xFF)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  private def imageioDecodeGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    val out = Array.tabulate(w * h)(i => img.getRaster.getSample(i % w, i / w, 0).toByte)
    (w, h, out)
  }

  private def imageioDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = img.getRGB(x, y)
      val p = (y * w + x) * 3
      rgb(p) = ((v >>> 16) & 0xFF).toByte
      rgb(p + 1) = ((v >>> 8) & 0xFF).toByte
      rgb(p + 2) = (v & 0xFF).toByte
    }
    (w, h, rgb)
  }

  test("decodes the JDK encoder's 4:2:0 color output like the JDK's own decoder") {
    val w = 48; val h = 40
    // smooth low-frequency image so subsampling-filter differences
    // (our nearest vs ImageIO's interpolation) stay small
    val rgb = Array.tabulate(w * h * 3) { p =>
      val i = p / 3; val x = i % w; val y = i / w
      (p % 3 match {
        case 0 => 60 + x * 2
        case 1 => 40 + y * 3
        case 2 => 120 + x + y
      }).toByte
    }
    val wire = imageioEncode(w, h, rgb)
    val Some((dw, dh, ours)) = Jpeg.decode(wire)
    val (jw, jh, theirs) = imageioDecode(wire)
    assert(dw === jw && dh === jh && dw === w && dh === h)
    assert(meanDiff(ours, theirs) <= 3.0,
      s"mean diff vs ImageIO decode = ${meanDiff(ours, theirs)}")
    assert(maxDiff(ours, theirs) <= 32) // isolated chroma-edge pixels
  }

  test("decodes the JDK encoder's grayscale output like the JDK's own decoder") {
    val w = 32; val h = 24
    val luma = Array.tabulate(w * h)(i => (30 + (i % w) * 4 + (i / w)).toByte)
    val wire = imageioEncodeGray(w, h, luma)
    val Some((dw, dh, ours)) = Jpeg.decode(wire)
    val (jw, jh, theirs) = imageioDecodeGray(wire)
    assert(dw === jw && dh === jh)
    val oursGray = Array.tabulate(w * h)(i => ours(i * 3))
    assert(meanDiff(oursGray, theirs) <= 2.0)
    assert(maxDiff(oursGray, theirs) <= 8)
  }

  test("the JDK decoder reads our encoder's wire format") {
    val w = 24; val h = 16
    val luma = grayFormula(w, h, 7)
    val (jw, jh, theirs) = imageioDecodeGray(Jpeg.encodeGray(w, h, luma, Jpeg.FlatQuant))
    assert(jw === w && jh === h)
    assert(maxDiff(theirs, luma) <= 3)

    val rgb = rgbFormula(w, h, 9)
    val (cw, ch, cback) = imageioDecode(Jpeg.encodeRgb(w, h, rgb, Jpeg.FlatQuant, Jpeg.FlatQuant))
    assert(cw === w && ch === h)
    assert(maxDiff(cback, rgb) <= 6)
  }

  // ------------------------------------------------------- progressive

  test("progressive lossless corner: constant 8x8 blocks + flat quant bit-exact") {
    val w = 24; val h = 16
    for (seed <- 0 until 8) {
      val luma = Array.tabulate(w * h) { i =>
        val bx = (i % w) / 8; val by = (i / w) / 8
        ((seed * 31 + bx * 17 + by * 47) % 256).toByte
      }
      val jpg = Jpeg.encodeGrayProgressive(w, h, luma, Jpeg.FlatQuant)
      // the wire really is progressive (SOF2) with multiple scans
      assert((0 until jpg.length - 1).exists(i =>
        (jpg(i) & 0xFF) == 0xFF && (jpg(i + 1) & 0xFF) == 0xC2))
      assert(jpg.sliding(2).count(p => (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xDA) === 6)
      val Some((dw, dh, rgb)) = Jpeg.decode(jpg)
      assert(dw === w && dh === h)
      for (i <- 0 until w * h) assert(rgb(i * 3) === luma(i), s"pixel $i seed $seed")
    }
  }

  test("progressive decode == baseline decode on the same general image (same coefficients)") {
    // every scan mode carries exact coefficient bits, so after the final
    // refinement the coefficient planes must equal the baseline scan's
    // and the decoded rasters must be BIT-identical
    for ((w, h, seed) <- Seq((33, 25, 3), (24, 16, 7), (8, 8, 1), (41, 9, 5))) {
      val luma = grayFormula(w, h, seed)
      for (quant <- Seq(Jpeg.FlatQuant, Jpeg.quantForQuality(Jpeg.StdLumQuant, 80))) {
        val Some((bw2, bh2, base)) = Jpeg.decode(Jpeg.encodeGray(w, h, luma, quant))
        val Some((pw2, ph2, prog)) =
          Jpeg.decode(Jpeg.encodeGrayProgressive(w, h, luma, quant))
        assert(bw2 === pw2 && bh2 === ph2)
        assert(java.util.Arrays.equals(base, prog),
          s"progressive != baseline at w=$w h=$h seed=$seed")
      }
    }
  }

  test("progressive restart markers: RSTn in every scan, still bit-exact") {
    val w = 40; val h = 24 // 5x3 = 15 blocks, interval 4
    val luma = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      ((bx * 53 + by * 11 + 7) % 256).toByte
    }
    val jpg = Jpeg.encodeGrayProgressive(w, h, luma, Jpeg.FlatQuant, restartInterval = 4)
    assert((0 until jpg.length - 1).exists(i =>
      (jpg(i) & 0xFF) == 0xFF && (jpg(i + 1) & 0xFF) >= 0xD0 && (jpg(i + 1) & 0xFF) <= 0xD7))
    val Some((dw, dh, rgb)) = Jpeg.decode(jpg)
    assert(dw === w && dh === h)
    for (i <- 0 until w * h) assert(rgb(i * 3) === luma(i))
  }

  test("EOB runs > 1: hand-built progressive stream with a custom AC table") {
    // 32x8 gray = 4 blocks, all constant (zero AC): one DC-first scan,
    // then an AC scan whose single token is EOB4 (symbol 0x20 + 2 bits
    // 0b00: run = (1<<2) + 0 = 4 blocks) — exercises the eobrun skip path
    // the Annex-K-table encoder cannot emit. Custom AC DHT: symbols
    // 0x00 (EOB1) and 0x20 (EOB4) at code lengths 1 and 2.
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def segment(m: Int, payload: Array[Int]): Unit = {
      marker(m); val len = payload.length + 2
      out.write(len >>> 8); out.write(len & 0xFF)
      payload.foreach(b => out.write(b & 0xFF))
    }
    marker(0xD8)
    segment(0xDB, Array(0) ++ Array.fill(64)(1)) // flat quant
    segment(0xC2, Array(8, 0, 8, 0, 32, 1, 1, 0x11, 0)) // SOF2 32x8 gray
    // DC table: Annex K luminance
    segment(0xC4, Array(0x00, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0,
      0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
    // custom AC table: len1 -> {0x00}, len2 -> {0x20}
    segment(0xC4, Array(0x10, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0x00, 0x20))
    // scan 1: DC first Al=0; blocks have luma 64,80,96,112 -> DC 64-128=-64
    // then +16 steps; categories/diffs via the standard table
    segment(0xDA, Array(1, 1, 0x00, 0, 0, 0x00))
    val bw = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nb = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); nb += len
      while (nb >= 8) {
        val b = ((acc >>> (nb - 8)) & 0xFF).toInt
        bw.write(b); if (b == 0xFF) bw.write(0x00)
        nb -= 8
      }
    }
    // a constant-v block's DC coefficient is (v-128)*8 (Cn(0)^2 folds the
    // 64-sample sum to ×8): 64→-512, 80→-384, 96→-256, 112→-128.
    // Use the canonical table programmatically instead of hand-deriving:
    val dcCodes = { // rebuild Annex K DC canonical codes (bits, vals above)
      val bits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
      val vals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
      val code = new Array[Int](12); val len = new Array[Int](12)
      var c = 0; var k = 0
      for (l <- 1 to 16) {
        for (_ <- 0 until bits(l)) { code(vals(k)) = c; len(vals(k)) = l; c += 1; k += 1 }
        c <<= 1
      }
      (code, len)
    }
    var prevDc = 0
    for (dc <- Seq(-512, -384, -256, -128)) {
      val diff = dc - prevDc; prevDc = dc
      var a = math.abs(diff); var t = 0
      while (a != 0) { a >>>= 1; t += 1 }
      put(dcCodes._1(t), dcCodes._2(t))
      if (t > 0) put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    }
    if (nb > 0) put(0x7F, 8 - nb) // pad
    bw.toByteArray.foreach(b => out.write(b & 0xFF))
    // scan 2: AC first Ss=1 Se=63 Ah=0 Al=0; one EOB4 token: code of 0x20
    // is len-2 '10'; 2 appended bits 00; pad with 1s -> byte 1000_1111
    segment(0xDA, Array(1, 1, 0x00, 1, 63, 0x00))
    out.write(0x8F)
    marker(0xD9)
    val wire = out.toByteArray
    val Some((dw, dh, rgb)) = Jpeg.decode(wire)
    assert(dw === 32 && dh === 8)
    for (i <- 0 until 32 * 8) {
      val expected = (64 + ((i % 32) / 8) * 16).toByte
      assert(rgb(i * 3) === expected, s"pixel $i")
    }
  }

  test("decodes ImageIO-written progressive streams like ImageIO's own decoder") {
    // the JDK writer's progressive script (libjpeg jpeg_simple_progression)
    // uses optimized Huffman tables, real EOB runs and AC refinements —
    // the paths our Annex-K encoder cannot emit
    def progressiveWrite(img: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    // gray
    val w = 32; val h = 24
    val luma = Array.tabulate(w * h)(i => (30 + (i % w) * 4 + (i / w)).toByte)
    val gimg = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) gimg.getRaster.setSample(x, y, 0, luma(y * w + x) & 0xFF)
    val gwire = progressiveWrite(gimg)
    assert((0 until gwire.length - 1).exists(i =>
      (gwire(i) & 0xFF) == 0xFF && (gwire(i + 1) & 0xFF) == 0xC2), "JDK wrote SOF2")
    val Some((gw2, gh2, ours)) = Jpeg.decode(gwire)
    val (jw, jh, theirs) = imageioDecodeGray(gwire)
    assert(gw2 === jw && gh2 === jh)
    val oursGray = Array.tabulate(gw2 * gh2)(i => ours(i * 3))
    assert(meanDiff(oursGray, theirs) <= 2.0)
    assert(maxDiff(oursGray, theirs) <= 8)
    // color 4:2:0 (subsampled MCU geometry + interleaved DC scan)
    val cw = 48; val ch = 40
    val rgb = Array.tabulate(cw * ch * 3) { p =>
      val i = p / 3; val x = i % cw; val y = i / cw
      (p % 3 match {
        case 0 => 60 + x * 2
        case 1 => 40 + y * 3
        case 2 => 120 + x + y
      }).toByte
    }
    val cimg = new java.awt.image.BufferedImage(cw, ch, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until ch; x <- 0 until cw) {
      val p = (y * cw + x) * 3
      cimg.setRGB(x, y, ((rgb(p) & 0xFF) << 16) | ((rgb(p + 1) & 0xFF) << 8) | (rgb(p + 2) & 0xFF))
    }
    val cwire = progressiveWrite(cimg)
    val Some((dw, dh, oursC)) = Jpeg.decode(cwire)
    val (iw, ih, theirsC) = imageioDecode(cwire)
    assert(dw === iw && dh === ih && dw === cw && dh === ch)
    assert(meanDiff(oursC, theirsC) <= 3.0,
      s"mean diff vs ImageIO progressive decode = ${meanDiff(oursC, theirsC)}")
    assert(maxDiff(oursC, theirsC) <= 32)
  }

  test("the JDK decoder reads our progressive wire") {
    val w = 24; val h = 16
    val luma = grayFormula(w, h, 7)
    val (jw, jh, theirs) =
      imageioDecodeGray(Jpeg.encodeGrayProgressive(w, h, luma, Jpeg.FlatQuant))
    assert(jw === w && jh === h)
    assert(maxDiff(theirs, luma) <= 3)
  }

  // ---------------------------------------------------- robustness

  test("arithmetic / lossless / malformed-progressive streams are rejected, not mis-decoded") {
    val base = Jpeg.encodeGray(16, 16, grayFormula(16, 16, 1), Jpeg.FlatQuant)
    val sof = (0 until base.length - 1).find(i =>
      (base(i) & 0xFF) == 0xFF && (base(i + 1) & 0xFF) == 0xC0).get
    // SOF0 flipped to SOF2 leaves a baseline scan header (Ss=0, Se=63)
    // that is illegal in a progressive frame (a DC scan must have Se=0)
    val prog = base.clone()
    prog(sof + 1) = 0xC2.toByte
    assert(Jpeg.decode(prog).isEmpty)
    val arith = base.clone()
    arith(sof + 1) = 0xC9.toByte
    assert(Jpeg.decode(arith).isEmpty)
    val lossless = base.clone()
    lossless(sof + 1) = 0xC3.toByte
    assert(Jpeg.decode(lossless).isEmpty)
  }

  test("truncation and byte corruption never throw (None or a decoded raster)") {
    val base = Jpeg.encodeGray(24, 16, grayFormula(24, 16, 4), Jpeg.FlatQuant)
    for (cut <- Seq(1, 2, 5, 20, base.length / 2, base.length - 1)) {
      Jpeg.decode(base.take(cut)) // must not throw
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val corrupt = base.clone()
      corrupt(rnd.nextInt(corrupt.length)) = rnd.nextInt(256).toByte
      Jpeg.decode(corrupt) // any Option is fine; throwing is the failure
    }
    // same discipline on the progressive wire (multi-scan marker walk)
    val prog = Jpeg.encodeGrayProgressive(24, 16, grayFormula(24, 16, 4), Jpeg.FlatQuant)
    for (cut <- Seq(2, 20, prog.length / 3, prog.length / 2, prog.length - 1)) {
      Jpeg.decode(prog.take(cut))
    }
    for (_ <- 0 until 200) {
      val corrupt = prog.clone()
      corrupt(rnd.nextInt(corrupt.length)) = rnd.nextInt(256).toByte
      Jpeg.decode(corrupt)
    }
    assert(Jpeg.decode(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode("not a jpeg".getBytes).isEmpty)
  }

  test("decodeImage dispatches jpeg; decodeFeatures leaves the stub for it") {
    val w = 16; val h = 16
    val luma = grayFormula(w, h, 2)
    val jpg = Jpeg.encodeGray(w, h, luma, Jpeg.FlatQuant)
    assert(Multimodal.sniffMagic(jpg) === "jpeg")
    val Some((dw, dh, _)) = Multimodal.decodeImage(jpg)
    assert(dw === w && dh === h)
    // features now come from real pixels, not the byte histogram
    val feats = Multimodal.decodeFeatures(jpg)
    assert(feats.toSeq !== Multimodal.decodeStub(jpg).toSeq)
    // header-only dims parser agrees with the full decode
    assert(Multimodal.imageDims(jpg) === Some((w, h)))
  }
}

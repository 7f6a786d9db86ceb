package dedup

/** REAL baseline JPEG codec — no media library, pure JVM: the format is
  * ITU-T T.81 (public spec) and every piece is plain arithmetic — canonical
  * Huffman coding (Annex C), zigzag + uniform scalar quantization, and the
  * 8×8 DCT-II/III. With PNG (Inflater), GIF (LZW), BMP and WAV PCM already
  * decoding for real in [[Multimodal]], this retires `decodeStub` for the
  * single most common web image format.
  *
  * Decoder scope (returns None, never throws, outside it):
  *   - baseline sequential DCT (SOF0; SOF1 accepted — same entropy coding),
  *     8-bit precision, 1 or 3 components;
  *   - PROGRESSIVE DCT (SOF2, spec G.1.2): spectral selection +
  *     successive approximation, DC and AC first/refinement scans,
  *     interleaved DC scans, EOB runs, per-scan restart markers —
  *     coefficients accumulate across scans in per-component zigzag
  *     planes and the IDCT runs once at EOI;
  *   - arbitrary sampling factors 1..4 per axis (covers 4:4:4, 4:2:2,
  *     4:2:0, 4:1:1) with integer nearest upsampling;
  *   - restart intervals (DRI + RSTn), stuffed-byte unstuffing, APPn/COM
  *     skip, 8- and 16-bit DQT entries;
  *   - lossless/hierarchical (SOF3/5-7/11-15), arithmetic coding
  *     (SOF9-11), 12-bit precision → None.
  *
  * Encoder scope: baseline sequential ([[encodeGray]]/[[encodeRgb]]) and
  * progressive grayscale ([[encodeGrayProgressive]] — six scans covering
  * every G.1.2 coding mode), caller-supplied or quality-scaled Annex K
  * quantization tables, Annex K.3 Huffman tables. The encoder exists so fixtures and oracle
  * rows carry pixels whose provenance is an integer formula (same pattern
  * as `encodePng`/`encodeGif`): DC-only images (constant 8×8 blocks) with
  * a flat quant table round-trip BIT-EXACTLY — the lossy format's lossless
  * corner — which is what makes a DuckDB-replicable oracle row possible.
  * JpegSpec additionally cross-validates both directions against the JDK's
  * own ImageIO JPEG codec (an independent implementation of the same spec).
  *
  * Determinism: DCT tables come from StrictMath (bit-identical on every
  * JVM); everything else is integer math.
  *
  * Reference shape: the reference toolkit treats images as opaque blobs
  * (no decode at all) — this is new capability, not a port.
  */
object Jpeg {

  // ------------------------------------------------------------ constants

  /** Zigzag scan order, spec Figure A.6: Zigzag(k) = raster index of the
    * k-th coefficient in transmission order. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table (raster order). */
  val StdLumQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table (raster order). */
  val StdChrQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** A flat all-ones table: quantization becomes round-to-integer only —
    * the config under which constant-block images round-trip bit-exactly
    * (used by the oracle row and golden tests). */
  val FlatQuant: Array[Int] = Array.fill(64)(1)

  /** libjpeg's public quality→scale mapping over the Annex K tables. */
  def quantForQuality(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  // Annex K.3 Huffman table specs: (bits[1..16] counts, values).
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val DcChrBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChrBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // DCT-II basis, StrictMath for cross-JVM bit identity:
  // Cos(x)(u) = cos((2x+1)·u·π/16), Cn(u) = normalization C(u)/2.
  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16))
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => (if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0) / 2.0)

  // ------------------------------------------------------- canonical codes

  /** Canonical Huffman codes from a (bits, values) spec — Annex C order:
    * codes of length L are consecutive, lengths ascend. Returns
    * (codeOf(value), lenOf(value)) dense over 0..255. */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): (Array[Int], Array[Int]) = {
    val code = new Array[Int](256)
    val len = new Array[Int](256)
    var c = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        code(vals(k)) = c
        len(vals(k)) = l
        c += 1; k += 1; i += 1
      }
      c <<= 1
      l += 1
    }
    (code, len)
  }

  /** Decode-side canonical table (spec F.2.2.3): per length, the smallest
    * and largest code and the index of the first value. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = c
          c += bits(l); k += bits(l)
          maxCode(l) = c - 1
        }
        c <<= 1
        l += 1
      }
    }
  }

  // -------------------------------------------------------------- bit I/O

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code.toLong & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xFF).toInt
        out.write(b)
        if (b == 0xFF) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    /** Pad to a byte boundary with 1-bits (spec F.1.2.3). */
    def flush(): Unit = if (nbits > 0) put(0x7F, 8 - nbits)
  }

  /** Entropy-segment bit reader: unstuffs FF00, stops at any real marker
    * (leaving the cursor on its FF), never reads past `bytes.length`.
    * Missing bits read as 0 past a marker — the MCU loop bounds total
    * reads so this only pads a truncated tail, it cannot loop. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nbits = 0
    var hitMarker = false

    private def fill(): Unit = {
      while (nbits <= 48 && pos < bytes.length && !hitMarker) {
        val b = bytes(pos) & 0xFF
        if (b == 0xFF) {
          if (pos + 1 < bytes.length && (bytes(pos + 1) & 0xFF) == 0x00) {
            acc = (acc << 8) | 0xFF; nbits += 8; pos += 2
          } else { hitMarker = true } // real marker: stop before it
        } else { acc = (acc << 8) | b; nbits += 8; pos += 1 }
      }
    }

    def bit(): Int = {
      if (nbits == 0) fill()
      if (nbits == 0) return 0 // truncated stream pads with zeros
      nbits -= 1
      ((acc >>> nbits) & 1L).toInt
    }

    def bitsValue(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def decodeHuff(t: HuffDecoder): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.values(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      -1 // invalid code
    }

    /** Drop partial byte and consume an expected RSTn marker. False if the
      * next marker is not RST (corrupt stream). */
    def restart(): Boolean = {
      acc = 0L; nbits = 0; hitMarker = false
      if (pos + 1 >= bytes.length) return false
      if ((bytes(pos) & 0xFF) != 0xFF) return false
      val m = bytes(pos + 1) & 0xFF
      if (m < 0xD0 || m > 0xD7) return false
      pos += 2
      true
    }
  }

  // ----------------------------------------------------------------- DCT

  /** Forward 8×8 DCT-II with level shift; `in` holds 64 samples 0..255
    * raster order; output raster order, unquantized. */
  private def fdct(in: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: sum over x
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += (in(y * 8 + x) - 128) * Cos(x)(u); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) { // cols: sum over y
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Cos(yy)(v); yy += 1 }
        out(v * 8 + u) = Cn(u) * Cn(v) * s
        u += 1
      }
      v += 1
    }
  }

  /** Inverse 8×8 DCT (DCT-III) of dequantized raster-order coefficients;
    * output is level-shifted back and clamped to 0..255. */
  private def idct(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // rows of coefficients: sum over u
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Cn(u) * in(v * 8 + u) * Cos(x)(u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += Cn(vv) * tmp(vv * 8 + x) * Cos(y)(vv); vv += 1 }
        val p = math.round(s + 128).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  // --------------------------------------------------------------- encode

  private def magnitudeCategory(v: Int): Int = {
    var a = if (v < 0) -v else v
    var n = 0
    while (a != 0) { a >>>= 1; n += 1 }
    n
  }

  private final class BlockEncoder(
      bw: BitWriter,
      dcCode: (Array[Int], Array[Int]),
      acCode: (Array[Int], Array[Int]),
      quant: Array[Int]) {
    private var prevDc = 0
    private val coef = new Array[Double](64)
    private val q = new Array[Int](64)

    def encode(samples: Array[Int]): Unit = {
      fdct(samples, coef)
      var i = 0
      while (i < 64) {
        // round-half-away quantization (libjpeg convention)
        val c = coef(i) / quant(i)
        q(i) = math.floor(c + 0.5).toInt
        i += 1
      }
      // DC
      val diff = q(0) - prevDc
      prevDc = q(0)
      val t = magnitudeCategory(diff)
      bw.put(dcCode._1(t), dcCode._2(t))
      if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      // AC
      var run = 0
      var k = 1
      while (k < 64) {
        val v = q(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run >= 16) { bw.put(acCode._1(0xF0), acCode._2(0xF0)); run -= 16 }
          val s = magnitudeCategory(v)
          val sym = (run << 4) | s
          bw.put(acCode._1(sym), acCode._2(sym))
          bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acCode._1(0x00), acCode._2(0x00)) // EOB
    }
  }

  private def writeMarker(out: java.io.ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xFF); out.write(m)
  }

  private def writeSegment(out: java.io.ByteArrayOutputStream, m: Int, payload: Array[Int]): Unit = {
    writeMarker(out, m)
    val len = payload.length + 2
    out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
    payload.foreach(b => out.write(b & 0xFF))
  }

  private def dqtPayload(id: Int, quant: Array[Int]): Array[Int] =
    Array(id) ++ (0 until 64).map(k => quant(Zigzag(k)))

  private def dhtPayload(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Array[Int] =
    Array((cls << 4) | id) ++ bits.drop(1) ++ vals

  /** Grayscale baseline JPEG from a top-down luma raster (one byte per
    * pixel, 0..255). Edge blocks pad by edge replication. A positive
    * `restartInterval` emits DRI + RSTn markers every that many MCUs
    * (spec E.2.4) — the decoder's restart path is round-trip-tested
    * through it. */
  def encodeGray(
      w: Int, h: Int, luma: Array[Byte],
      quant: Array[Int] = StdLumQuant,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && luma.length == w * h, "luma must be w*h")
    val out = new java.io.ByteArrayOutputStream(1024 + w * h / 4)
    writeMarker(out, 0xD8) // SOI
    writeSegment(out, 0xDB, dqtPayload(0, quant))
    writeSegment(out, 0xC0, Array(8, h >>> 8, h & 0xFF, w >>> 8, w & 0xFF, 1, 1, 0x11, 0))
    writeSegment(out, 0xC4, dhtPayload(0, 0, DcLumBits, DcLumVals))
    writeSegment(out, 0xC4, dhtPayload(1, 0, AcLumBits, AcLumVals))
    if (restartInterval > 0)
      writeSegment(out, 0xDD, Array(restartInterval >>> 8, restartInterval & 0xFF))
    writeSegment(out, 0xDA, Array(1, 1, 0x00, 0, 63, 0))
    var bw = new BitWriter(out)
    var enc = new BlockEncoder(bw, buildEncodeTable(DcLumBits, DcLumVals),
      buildEncodeTable(AcLumBits, AcLumVals), quant)
    val blk = new Array[Int](64)
    var mcu = 0
    var by = 0
    while (by * 8 < h) {
      var bx = 0
      while (bx * 8 < w) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          writeMarker(out, 0xD0 + ((mcu / restartInterval - 1) % 8))
          bw = new BitWriter(out)
          enc = new BlockEncoder(bw, buildEncodeTable(DcLumBits, DcLumVals),
            buildEncodeTable(AcLumBits, AcLumVals), quant)
        }
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, h - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, w - 1)
            blk(y * 8 + x) = luma(sy * w + sx) & 0xFF
            x += 1
          }
          y += 1
        }
        enc.encode(blk)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    writeMarker(out, 0xD9) // EOI
    out.toByteArray
  }

  /** Color 4:4:4 baseline JPEG from a top-down RGB raster (same input
    * contract as [[Multimodal.encodeBmp]]). JFIF YCbCr conversion. */
  def encodeRgb(
      w: Int, h: Int, rgb: Array[Byte],
      lumQuant: Array[Int] = StdLumQuant,
      chrQuant: Array[Int] = StdChrQuant): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3, "rgb must be w*h*3")
    val out = new java.io.ByteArrayOutputStream(1024 + w * h / 2)
    writeMarker(out, 0xD8)
    writeSegment(out, 0xDB, dqtPayload(0, lumQuant))
    writeSegment(out, 0xDB, dqtPayload(1, chrQuant))
    writeSegment(out, 0xC0, Array(8, h >>> 8, h & 0xFF, w >>> 8, w & 0xFF, 3,
      1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    writeSegment(out, 0xC4, dhtPayload(0, 0, DcLumBits, DcLumVals))
    writeSegment(out, 0xC4, dhtPayload(1, 0, AcLumBits, AcLumVals))
    writeSegment(out, 0xC4, dhtPayload(0, 1, DcChrBits, DcChrVals))
    writeSegment(out, 0xC4, dhtPayload(1, 1, AcChrBits, AcChrVals))
    writeSegment(out, 0xDA, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    // planar YCbCr, integer-rounded JFIF conversion
    val n = w * h
    val py = new Array[Byte](n); val pcb = new Array[Byte](n); val pcr = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val r = rgb(i * 3) & 0xFF; val g = rgb(i * 3 + 1) & 0xFF; val b = rgb(i * 3 + 2) & 0xFF
      def clamp(v: Double): Byte = {
        val x = math.round(v).toInt
        (if (x < 0) 0 else if (x > 255) 255 else x).toByte
      }
      py(i) = clamp(0.299 * r + 0.587 * g + 0.114 * b)
      pcb(i) = clamp(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
      pcr(i) = clamp(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
      i += 1
    }
    val bw = new BitWriter(out)
    val encY = new BlockEncoder(bw, buildEncodeTable(DcLumBits, DcLumVals),
      buildEncodeTable(AcLumBits, AcLumVals), lumQuant)
    val dcChr = buildEncodeTable(DcChrBits, DcChrVals)
    val acChr = buildEncodeTable(AcChrBits, AcChrVals)
    val encCb = new BlockEncoder(bw, dcChr, acChr, chrQuant)
    val encCr = new BlockEncoder(bw, dcChr, acChr, chrQuant)
    val blk = new Array[Int](64)
    def loadBlock(plane: Array[Byte], bx: Int, by: Int): Unit = {
      var y = 0
      while (y < 8) {
        val sy = math.min(by * 8 + y, h - 1)
        var x = 0
        while (x < 8) {
          blk(y * 8 + x) = plane(sy * w + math.min(bx * 8 + x, w - 1)) & 0xFF
          x += 1
        }
        y += 1
      }
    }
    var by = 0
    while (by * 8 < h) {
      var bx = 0
      while (bx * 8 < w) {
        loadBlock(py, bx, by); encY.encode(blk)
        loadBlock(pcb, bx, by); encCb.encode(blk)
        loadBlock(pcr, bx, by); encCr.encode(blk)
        bx += 1
      }
      by += 1
    }
    bw.flush()
    writeMarker(out, 0xD9)
    out.toByteArray
  }

  /** Progressive grayscale JPEG (SOF2) from the same raster contract as
    * [[encodeGray]]. Six scans exercise every progressive coding mode of
    * G.1.2: DC first at Al=1, DC refinement, AC first per spectral band
    * (1–5, 6–63) at Al=1, and AC refinement of both bands down to Al=0 —
    * so a decode reconstructs exactly the coefficients [[encodeGray]]
    * would transmit, and on the lossless corner (constant 8×8 blocks +
    * flat quant) the round-trip is bit-exact like the baseline's.
    *
    * EOB runs are emitted per block (run length 1): the Annex K AC table
    * carries no EOBn symbols for longer runs (r∈[1,14], s=0), and a
    * length-1 run is a legal degenerate encoding every decoder accepts.
    * Longer runs are exercised on the DECODE side by ImageIO-written
    * progressive streams (JpegSpec) whose optimized tables have them.
    * `restartInterval > 0` puts DRI + RSTn in every scan (counted in
    * blocks — each scan here is non-interleaved). */
  def encodeGrayProgressive(
      w: Int, h: Int, luma: Array[Byte],
      quant: Array[Int] = StdLumQuant,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && luma.length == w * h, "luma must be w*h")
    val bw8 = (w + 7) / 8; val bh8 = (h + 7) / 8
    // quantized zigzag-order coefficients per block, block raster order
    val coefs = new Array[Array[Int]](bw8 * bh8)
    val blk = new Array[Int](64)
    val f = new Array[Double](64)
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, h - 1)
          var x = 0
          while (x < 8) {
            blk(y * 8 + x) = luma(sy * w + math.min(bx * 8 + x, w - 1)) & 0xFF
            x += 1
          }
          y += 1
        }
        fdct(blk, f)
        val q = new Array[Int](64)
        var k = 0
        while (k < 64) {
          q(k) = math.floor(f(Zigzag(k)) / quant(Zigzag(k)) + 0.5).toInt
          k += 1
        }
        coefs(by * bw8 + bx) = q
        bx += 1
      }
      by += 1
    }
    val out = new java.io.ByteArrayOutputStream(1024 + w * h / 4)
    writeMarker(out, 0xD8)
    writeSegment(out, 0xDB, dqtPayload(0, quant))
    writeSegment(out, 0xC2, Array(8, h >>> 8, h & 0xFF, w >>> 8, w & 0xFF, 1, 1, 0x11, 0))
    writeSegment(out, 0xC4, dhtPayload(0, 0, DcLumBits, DcLumVals))
    writeSegment(out, 0xC4, dhtPayload(1, 0, AcLumBits, AcLumVals))
    if (restartInterval > 0)
      writeSegment(out, 0xDD, Array(restartInterval >>> 8, restartInterval & 0xFF))
    val dcCode = buildEncodeTable(DcLumBits, DcLumVals)
    val acCode = buildEncodeTable(AcLumBits, AcLumVals)

    def rst(bwr: BitWriter, b: Int): Unit =
      if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
        bwr.flush()
        writeMarker(out, 0xD0 + ((b / restartInterval - 1) % 8))
      }

    // ---- scan 1: DC first, Al=1 (coefficients arrive arithmetic-shifted)
    writeSegment(out, 0xDA, Array(1, 1, 0x00, 0, 0, 0x01))
    var bwr = new BitWriter(out)
    var prevDc = 0
    var b = 0
    while (b < coefs.length) {
      rst(bwr, b); if (restartInterval > 0 && b > 0 && b % restartInterval == 0) prevDc = 0
      val v = coefs(b)(0) >> 1
      val diff = v - prevDc
      prevDc = v
      val t = magnitudeCategory(diff)
      bwr.put(dcCode._1(t), dcCode._2(t))
      if (t > 0) bwr.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      b += 1
    }
    bwr.flush()

    // ---- scan 2: DC refinement, Ah=1 → Al=0 (one raw bit per block)
    writeSegment(out, 0xDA, Array(1, 1, 0x00, 0, 0, 0x10))
    bwr = new BitWriter(out)
    b = 0
    while (b < coefs.length) {
      rst(bwr, b)
      bwr.put(coefs(b)(0) & 1, 1)
      b += 1
    }
    bwr.flush()

    // ---- AC first pass over a spectral band at Al=1 (G.1.2.2)
    def acFirstScan(ss: Int, seBand: Int, al: Int): Unit = {
      writeSegment(out, 0xDA, Array(1, 1, 0x00, ss, seBand, al))
      val wtr = new BitWriter(out)
      var bi = 0
      while (bi < coefs.length) {
        rst(wtr, bi)
        val q = coefs(bi)
        var r = 0
        var k = ss
        while (k <= seBand) {
          val raw = q(k)
          val v = if (raw >= 0) raw >> al else -((-raw) >> al)
          if (v == 0) r += 1
          else {
            while (r > 15) { wtr.put(acCode._1(0xF0), acCode._2(0xF0)); r -= 16 }
            val s = magnitudeCategory(v)
            wtr.put(acCode._1((r << 4) | s), acCode._2((r << 4) | s))
            wtr.put(if (v < 0) v + (1 << s) - 1 else v, s)
            r = 0
          }
          k += 1
        }
        if (r > 0) wtr.put(acCode._1(0x00), acCode._2(0x00)) // EOB, run 1
        bi += 1
      }
      wtr.flush()
    }

    // ---- AC refinement of a band, Ah=al+1 → Al=al (G.1.2.3): newly
    // visible coefficients as (run, 1) + sign; correction bits for
    // already-nonzero coefficients buffered and flushed after the next
    // symbol — the mirror of the decoder's interleaving
    def acRefineScan(ss: Int, seBand: Int, al: Int): Unit = {
      writeSegment(out, 0xDA, Array(1, 1, 0x00, ss, seBand, ((al + 1) << 4) | al))
      val wtr = new BitWriter(out)
      val pending = new scala.collection.mutable.ArrayBuffer[Int]()
      def flushPending(): Unit = { pending.foreach(wtr.put(_, 1)); pending.clear() }
      var bi = 0
      while (bi < coefs.length) {
        rst(wtr, bi) // pending is always empty at a block boundary
        val q = coefs(bi)
        var eobPos = ss - 1
        var k = ss
        while (k <= seBand) {
          if ((math.abs(q(k)) >> al) == 1) eobPos = k
          k += 1
        }
        var r = 0
        k = ss
        while (k <= seBand) {
          val a = math.abs(q(k)) >> al
          if (a == 0) r += 1
          else {
            while (r > 15 && k <= eobPos) {
              wtr.put(acCode._1(0xF0), acCode._2(0xF0)); r -= 16
              flushPending()
            }
            if (a > 1) pending += (a & 1)
            else {
              wtr.put(acCode._1((r << 4) | 1), acCode._2((r << 4) | 1))
              wtr.put(if (q(k) < 0) 0 else 1, 1)
              flushPending()
              r = 0
            }
          }
          k += 1
        }
        if (r > 0 || pending.nonEmpty) {
          wtr.put(acCode._1(0x00), acCode._2(0x00)) // EOB (run 1)
          flushPending()
        }
        bi += 1
      }
      wtr.flush()
    }

    acFirstScan(1, 5, 1)
    acFirstScan(6, 63, 1)
    acRefineScan(1, 5, 0)
    acRefineScan(6, 63, 0)
    writeMarker(out, 0xD9)
    out.toByteArray
  }

  // --------------------------------------------------------------- decode

  private final case class Comp(
      id: Int, hs: Int, vs: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0,
      var coef: Array[Int] = null, // zigzag-order coefficients, 64 per block
      var bw: Int = 0, var bh: Int = 0, // MCU-grid block geometry
      var bwEff: Int = 0, var bhEff: Int = 0, // effective blocks (A.2.2)
      var plane: Array[Int] = null, var pw: Int = 0, var ph: Int = 0,
      var prevDc: Int = 0)

  /** Decode a baseline OR progressive JPEG to (w, h, rgb-top-down) — same
    * contract as [[Multimodal.decodeBmp]]/`decodePng`/`decodeGif`. None
    * (never throws) for lossless/hierarchical/arithmetic/12-bit/malformed
    * input. Both modes decode into per-component zigzag coefficient
    * planes; a progressive stream (SOF2) accumulates them across scans
    * (spectral selection + successive approximation, G.1.2) and the IDCT
    * runs once at EOI. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = try {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    def u8(i: Int) = bytes(i) & 0xFF
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)

    val quant = new Array[Array[Int]](4) // raster order after dezigzag
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var progressive = false
    var scanSeen = false
    var hmax = 1; var vmax = 1; var mcusX = 0; var mcusY = 0
    var geomDone = false
    var pos = 2
    // raster-order pixel cap: same ceiling idiom as decodePng (a corrupt
    // header must not allocate unbounded planes)
    val MaxPixels = 1 << 26

    /** Allocate coefficient planes at the first SOS. Interleaved scans
      * cover the padded MCU grid (bw×bh blocks); non-interleaved scans
      * cover only the component's effective blocks (ceil of its true
      * sampled size, spec A.2.2) — padding blocks stay zero there. */
    def setupGeometry(): Boolean = {
      if (geomDone) return true
      hmax = comps.map(_.hs).max; vmax = comps.map(_.vs).max
      mcusX = (w + 8 * hmax - 1) / (8 * hmax)
      mcusY = (h + 8 * vmax - 1) / (8 * vmax)
      comps.foreach { c =>
        c.bw = mcusX * c.hs; c.bh = mcusY * c.vs
        if (c.bw.toLong * c.bh * 64 > MaxPixels.toLong * 4) return false
        c.coef = new Array[Int](c.bw * c.bh * 64)
        val cw = (w * c.hs + hmax - 1) / hmax
        val ch = (h * c.vs + vmax - 1) / vmax
        c.bwEff = (cw + 7) / 8; c.bhEff = (ch + 7) / 8
      }
      geomDone = true
      true
    }

    /** Dequantize + dezigzag + IDCT every block, then upsample and color
      * convert — the one pixel-producing pass, shared by both modes. */
    def assemble(): Option[(Int, Int, Array[Byte])] = {
      val zz = new Array[Int](64)
      val px = new Array[Int](64)
      comps.foreach { comp =>
        val q = quant(comp.tq); if (q == null) return None
        comp.pw = comp.bw * 8; comp.ph = comp.bh * 8
        comp.plane = new Array[Int](comp.pw * comp.ph)
        var by = 0
        while (by < comp.bh) {
          var bx = 0
          while (bx < comp.bw) {
            val base = (by * comp.bw + bx) * 64
            var k = 0
            while (k < 64) { zz(Zigzag(k)) = comp.coef(base + k) * q(Zigzag(k)); k += 1 }
            idct(zz, px)
            val ox = bx * 8; val oy = by * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                comp.plane((oy + yy) * comp.pw + ox + xx) = px(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
      }
      val rgb = new Array[Byte](w * h * 3)
      def sample(comp: Comp, x: Int, y: Int): Int =
        comp.plane((y * comp.vs / vmax) * comp.pw + (x * comp.hs / hmax))
      if (comps.length == 1) {
        val cY = comps(0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = sample(cY, x, y).toByte
            val p = (y * w + x) * 3
            rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g
            x += 1
          }
          y += 1
        }
      } else {
        val cY = comps(0); val cCb = comps(1); val cCr = comps(2)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val yy = sample(cY, x, y)
            val cb = sample(cCb, x, y) - 128
            val cr = sample(cCr, x, y) - 128
            def cl(v: Double): Byte = {
              val r = math.round(v).toInt
              (if (r < 0) 0 else if (r > 255) 255 else r).toByte
            }
            val p = (y * w + x) * 3
            rgb(p) = cl(yy + 1.402 * cr)
            rgb(p + 1) = cl(yy - 0.344136 * cb - 0.714136 * cr)
            rgb(p + 2) = cl(yy + 1.772 * cb)
            x += 1
          }
          y += 1
        }
      }
      Some((w, h, rgb))
    }

    /** One DC entry of a progressive scan: first pass (Ah=0) is the
      * baseline DC diff shifted left by Al; a refinement appends one raw
      * bit at position Al (G.1.2.1 — bitwise OR works for negatives in
      * two's complement). */
    def dcBlock(br: BitReader, comp: Comp, blockIdx: Int, ah: Int, al: Int): Boolean = {
      val base = blockIdx * 64
      if (ah == 0) {
        val t = br.decodeHuff(dcTabs(comp.td))
        if (t < 0 || t > 11) return false
        val diffBits = if (t == 0) 0 else br.bitsValue(t)
        val diff = if (t == 0) 0
          else if (diffBits < (1 << (t - 1))) diffBits - (1 << t) + 1
          else diffBits
        comp.prevDc += diff
        comp.coef(base) = comp.prevDc << al
      } else if (br.bit() == 1) comp.coef(base) |= (1 << al)
      true
    }

    /** The full-spectrum interleaved scan of a sequential frame — the
      * baseline path, now writing raw zigzag coefficients. */
    def decodeSequentialScan(br: BitReader): Boolean = {
      var mcu = 0
      val totalMcus = mcusX * mcusY
      while (mcu < totalMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!br.restart()) return false
          comps.foreach(_.prevDc = 0)
        }
        val mx = mcu % mcusX; val my = mcu / mcusX
        comps.foreach { comp =>
          val at = acTabs(comp.ta)
          var v = 0
          while (v < comp.vs) {
            var hh = 0
            while (hh < comp.hs) {
              val base = ((my * comp.vs + v) * comp.bw + (mx * comp.hs + hh)) * 64
              if (!dcBlock(br, comp, base / 64, 0, 0)) return false
              var k = 1
              while (k < 64) {
                val rs = br.decodeHuff(at)
                if (rs < 0) return false
                val r = rs >>> 4; val s = rs & 0xF
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += r
                  if (k > 63) return false
                  val vb = br.bitsValue(s)
                  comp.coef(base + k) =
                    if (vb < (1 << (s - 1))) vb - (1 << s) + 1 else vb
                  k += 1
                }
              }
              hh += 1
            }
            v += 1
          }
        }
        mcu += 1
      }
      true
    }

    /** One scan of a progressive frame (G.1.2): DC scans may interleave
      * 1..4 components over the MCU grid; AC scans are single-component
      * over the effective block grid. Restart markers reset DC prediction
      * and the EOB run. */
    def decodeProgressiveScan(br: BitReader, scanComps: Array[Comp],
        ss: Int, se: Int, ah: Int, al: Int): Boolean = {
      if (al > 13 || (ah != 0 && ah != al + 1)) return false
      if (ss == 0) {
        if (se != 0) return false // DC scan codes only coefficient 0
        if (ah == 0 && scanComps.exists(c => dcTabs(c.td) == null)) return false
        scanComps.foreach(_.prevDc = 0)
        if (scanComps.length > 1) {
          var mcu = 0
          val total = mcusX * mcusY
          while (mcu < total) {
            if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
              if (!br.restart()) return false
              scanComps.foreach(_.prevDc = 0)
            }
            val mx = mcu % mcusX; val my = mcu / mcusX
            var ci = 0
            while (ci < scanComps.length) {
              val comp = scanComps(ci)
              var v = 0
              while (v < comp.vs) {
                var hh = 0
                while (hh < comp.hs) {
                  if (!dcBlock(br, comp,
                      (my * comp.vs + v) * comp.bw + (mx * comp.hs + hh), ah, al))
                    return false
                  hh += 1
                }
                v += 1
              }
              ci += 1
            }
            mcu += 1
          }
        } else {
          val comp = scanComps(0)
          var blk = 0
          val total = comp.bwEff * comp.bhEff
          while (blk < total) {
            if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
              if (!br.restart()) return false
              comp.prevDc = 0
            }
            if (!dcBlock(br, comp,
                (blk / comp.bwEff) * comp.bw + blk % comp.bwEff, ah, al))
              return false
            blk += 1
          }
        }
        true
      } else {
        if (scanComps.length != 1 || se < ss || se > 63) return false
        val comp = scanComps(0)
        val at = acTabs(comp.ta); if (at == null) return false
        val p1 = 1 << al; val m1 = -1 << al
        var eobrun = 0
        var blk = 0
        val total = comp.bwEff * comp.bhEff
        while (blk < total) {
          if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
            if (!br.restart()) return false
            eobrun = 0
          }
          val base = ((blk / comp.bwEff) * comp.bw + blk % comp.bwEff) * 64
          if (ah == 0) {
            // AC first pass: baseline run/size coding + EOB runs; values
            // arrive scaled up by 2^Al (G.1.2.2)
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              var done = false
              while (k <= se && !done) {
                val rs = br.decodeHuff(at)
                if (rs < 0) return false
                val r = rs >>> 4; val s = rs & 0xF
                if (s == 0) {
                  if (r < 15) {
                    eobrun = (1 << r) - 1 + (if (r > 0) br.bitsValue(r) else 0)
                    done = true
                  } else k += 16 // ZRL
                } else {
                  k += r
                  if (k > 63) return false
                  val vb = br.bitsValue(s)
                  comp.coef(base + k) =
                    (if (vb < (1 << (s - 1))) vb - (1 << s) + 1 else vb) << al
                  k += 1
                }
              }
            }
          } else {
            // AC refinement (G.1.2.3): newly-nonzero coefficients arrive
            // as ±2^Al; every already-nonzero coefficient passed over
            // carries one correction bit
            var k = ss
            if (eobrun == 0) {
              var done = false
              while (k <= se && !done) {
                val rs = br.decodeHuff(at)
                if (rs < 0) return false
                var r = rs >>> 4; val s = rs & 0xF
                var newval = 0
                if (s == 0) {
                  if (r < 15) {
                    eobrun = (1 << r) + (if (r > 0) br.bitsValue(r) else 0)
                    done = true
                  }
                  // r == 15: ZRL — skip 16 zero-history positions below
                } else {
                  if (s != 1) return false // refinement magnitude must be 1
                  newval = if (br.bit() == 1) p1 else m1
                }
                if (!done) {
                  var stop = false
                  while (k <= se && !stop) {
                    val cv = comp.coef(base + k)
                    if (cv != 0) {
                      if (br.bit() == 1 && (cv & p1) == 0)
                        comp.coef(base + k) = cv + (if (cv >= 0) p1 else m1)
                    } else {
                      r -= 1
                      if (r < 0) stop = true
                    }
                    if (!stop) k += 1
                  }
                  if (newval != 0 && k <= se) comp.coef(base + k) = newval
                  k += 1
                }
              }
            }
            if (eobrun > 0) {
              // inside an EOB run: only correction bits for the block's
              // remaining nonzero coefficients
              while (k <= se) {
                val cv = comp.coef(base + k)
                if (cv != 0) {
                  if (br.bit() == 1 && (cv & p1) == 0)
                    comp.coef(base + k) = cv + (if (cv >= 0) p1 else m1)
                }
                k += 1
              }
              eobrun -= 1
            }
          }
          blk += 1
        }
        true
      }
    }

    while (pos + 2 <= bytes.length) { // EOI is a bare 2-byte marker
      if (u8(pos) != 0xFF) return None
      var m = u8(pos + 1)
      while (m == 0xFF && pos + 2 < bytes.length) { pos += 1; m = u8(pos + 1) }
      pos += 2
      m match {
        case 0xD9 => // EOI: a progressive frame assembles here
          return if (progressive && scanSeen) assemble() else None
        case 0xC0 | 0xC1 | 0xC2 => // SOF0/1 sequential, SOF2 progressive
          if (comps != null) return None // one frame per stream
          progressive = m == 0xC2
          val len = u16(pos); if (pos + len > bytes.length) return None
          val prec = u8(pos + 2)
          h = u16(pos + 3); w = u16(pos + 5)
          val nc = u8(pos + 7)
          if (prec != 8 || w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
          if (w.toLong * h > MaxPixels) return None
          comps = Array.tabulate(nc) { c =>
            val o = pos + 8 + c * 3
            val hv = u8(o + 1)
            val comp = Comp(u8(o), hv >>> 4, hv & 0xF, u8(o + 2))
            if (comp.hs < 1 || comp.hs > 4 || comp.vs < 1 || comp.vs > 4) return None
            comp
          }
          pos += len
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
          return None // lossless / hierarchical / arithmetic
        case 0xC4 => // DHT (possibly several tables in one segment)
          val len = u16(pos); if (pos + len > bytes.length) return None
          var p = pos + 2
          while (p < pos + len) {
            val tc = u8(p) >>> 4; val th = u8(p) & 0xF
            if (tc > 1 || th > 3) return None
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(p + l); total += bits(l); l += 1 }
            if (p + 17 + total > pos + len || total > 256) return None
            val vals = Array.tabulate(total)(i => u8(p + 17 + i))
            val t = new HuffDecoder(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + total
          }
          pos += len
        case 0xDB => // DQT
          val len = u16(pos); if (pos + len > bytes.length) return None
          var p = pos + 2
          while (p < pos + len) {
            val pq = u8(p) >>> 4; val tq = u8(p) & 0xF
            if (pq > 1 || tq > 3) return None
            val entry = 1 + pq
            if (p + 1 + 64 * entry > pos + len) return None
            val q = new Array[Int](64)
            var k = 0
            while (k < 64) {
              q(Zigzag(k)) = if (pq == 0) u8(p + 1 + k) else u16(p + 1 + 2 * k)
              k += 1
            }
            quant(tq) = q
            p += 1 + 64 * entry
          }
          pos += len
        case 0xDD => // DRI
          val len = u16(pos); if (pos + len > bytes.length) return None
          restartInterval = u16(pos + 2)
          pos += len
        case 0xDA => // SOS
          val len = u16(pos); if (pos + len > bytes.length) return None
          if (comps == null) return None
          val ns = u8(pos + 2)
          if (ns < 1 || ns > comps.length || pos + 6 + 2 * ns > bytes.length)
            return None
          val scanComps = new Array[Comp](ns)
          var c = 0
          while (c < ns) {
            val cs = u8(pos + 3 + 2 * c)
            val comp = comps.find(_.id == cs).getOrElse(return None)
            comp.td = u8(pos + 4 + 2 * c) >>> 4
            comp.ta = u8(pos + 4 + 2 * c) & 0xF
            if (comp.td > 3 || comp.ta > 3) return None
            scanComps(c) = comp
            c += 1
          }
          val ss = u8(pos + 3 + 2 * ns)
          val se = u8(pos + 4 + 2 * ns)
          val ah = u8(pos + 5 + 2 * ns) >>> 4
          val al = u8(pos + 5 + 2 * ns) & 0xF
          if (!setupGeometry()) return None
          val br = new BitReader(bytes, pos + len)
          if (!progressive) {
            // sequential: exactly one interleaved full-spectrum scan
            if (ns != comps.length || ss != 0 || se != 63 || ah != 0 || al != 0)
              return None
            comps.foreach { comp =>
              if (quant(comp.tq) == null || dcTabs(comp.td) == null ||
                  acTabs(comp.ta) == null) return None
            }
            if (!decodeSequentialScan(br)) return None
            return assemble()
          }
          if (!decodeProgressiveScan(br, scanComps, ss, se, ah, al)) return None
          scanSeen = true
          // resume the marker walk at the next real marker (the reader may
          // have stopped mid-byte; stuffed FF00 and stray RSTn are not
          // markers)
          var p = br.pos
          var next = -1
          while (next < 0 && p + 1 < bytes.length) {
            if ((bytes(p) & 0xFF) == 0xFF) {
              val m2 = bytes(p + 1) & 0xFF
              if (m2 == 0x00) p += 2
              else if (m2 >= 0xD0 && m2 <= 0xD7) p += 2
              else if (m2 == 0xFF) p += 1
              else next = p
            } else p += 1
          }
          if (next < 0) return None // truncated between scans
          pos = next
        case 0x01 => () // TEM: standalone, no payload
        case rst if rst >= 0xD0 && rst <= 0xD7 => () // stray RST: standalone
        case _ => // APPn, COM, anything else with a length
          val len = u16(pos); if (len < 2 || pos + len > bytes.length) return None
          pos += len
      }
    }
    None
  } catch { case _: Throwable => None }
}

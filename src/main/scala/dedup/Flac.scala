package dedup

/** REAL FLAC codec — no media library: FLAC (RFC 9639 / xiph spec) is a
  * LOSSLESS format whose machinery is all plain bit arithmetic — Rice
  * (Golomb power-of-two) residual codes, four fixed integer predictors,
  * integer LPC, and three stereo decorrelation modes. With WAV PCM already
  * decoding in [[Multimodal]], this brings the second web audio container
  * up from header-parse-only ([[Multimodal.flacMeta]]) to real samples,
  * and losslessness makes exact round-trip oracle rows possible (unlike
  * JPEG, which needs its DC-only corner — see [[Jpeg]]).
  *
  * Decoder scope (None, never throws, outside it):
  *   - subframe types CONSTANT, VERBATIM, FIXED orders 0–4, and LPC any
  *     order (warmup + quantized coefficients + shift);
  *   - Rice methods 0b00/0b01 incl. the escape (verbatim residual)
  *     parameter, any partition order;
  *   - channel assignments: 1–8 independent channels, left/side,
  *     right/side, mid/side;
  *   - 8/12/16/20/24-bit samples, wasted-bits shifts, all block-size
  *     codes, UTF-8 frame numbers, CRC-8-validated frame headers.
  *
  * Encoder scope (fixture dual): mono/stereo-independent 16-bit, fixed
  * predictors with per-frame order search, single-partition Rice.
  *
  * Reference shape: the reference toolkit never decodes audio — this is
  * new capability, same boundary honesty as the image codecs.
  */
object Flac {

  // ------------------------------------------------------------ CRC (spec)

  private val Crc8Table: Array[Int] = Array.tabulate(256) { b =>
    var c = b
    var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF; k += 1 }
    c
  }
  private val Crc16Table: Array[Int] = Array.tabulate(256) { b =>
    var c = b << 8
    var k = 0
    while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF; k += 1 }
    c
  }
  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table(c ^ (bytes(i) & 0xFF)); i += 1 }
    c
  }
  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc16Table(((c >>> 8) ^ (bytes(i) & 0xFF)) & 0xFF) ^ ((c << 8) & 0xFFFF); i += 1 }
    c
  }

  // ------------------------------------------------------------- bit I/O

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def put(v: Long, bits: Int): Unit = {
      var left = bits
      while (left > 0) {
        val take = math.min(left, 56 - n)
        acc = (acc << take) | ((v >>> (left - take)) & ((1L << take) - 1))
        n += take; left -= take
        while (n >= 8) { out.write(((acc >>> (n - 8)) & 0xFF).toInt); n -= 8 }
      }
    }
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def alignByte(): Unit = if (n > 0) put(0, 8 - n)
    def bytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  private final class BitReader(val buf: Array[Byte], startByte: Int) {
    var pos: Int = startByte // byte position of next fill
    private var acc = 0L
    private var n = 0
    def bitPos: Long = pos.toLong * 8 - n
    def bad: Boolean = pos > buf.length // read past end happened
    def bits(k: Int): Int = bitsLong(k).toInt
    def bitsLong(k: Int): Long = {
      var v = 0L
      var left = k
      while (left > 0) {
        if (n == 0) {
          if (pos >= buf.length) { pos = buf.length + 1; return v << left } // flag bad
          acc = buf(pos) & 0xFF; n = 8; pos += 1
        }
        val take = math.min(left, n)
        v = (v << take) | ((acc >>> (n - take)) & ((1L << take) - 1))
        n -= take; left -= take
      }
      v
    }
    def signedBits(k: Int): Int = (bits(k) << (32 - k)) >> (32 - k)
    def unary(): Int = {
      var q = 0
      while (bits(1) == 0) {
        q += 1
        if (q > (1 << 24) || bad) return -1
      }
      q
    }
    def alignByte(): Unit = { n = 0 }
    def byteAt: Int = pos - (n + 7) / 8 // current byte offset when aligned
  }

  // --------------------------------------------------------------- encode

  private def utf8FrameNum(bw: BitWriter, v: Long): Unit = {
    if (v < 0x80) bw.put(v, 8)
    else if (v < 0x800) { bw.put(0xC0 | (v >>> 6), 8); bw.put(0x80 | (v & 0x3F), 8) }
    else if (v < 0x10000) {
      bw.put(0xE0 | (v >>> 12), 8); bw.put(0x80 | ((v >>> 6) & 0x3F), 8); bw.put(0x80 | (v & 0x3F), 8)
    } else {
      bw.put(0xF0 | (v >>> 18), 8); bw.put(0x80 | ((v >>> 12) & 0x3F), 8)
      bw.put(0x80 | ((v >>> 6) & 0x3F), 8); bw.put(0x80 | (v & 0x3F), 8)
    }
  }

  private def fixedResidual(s: Array[Int], order: Int): Array[Int] = {
    val n = s.length - order
    val r = new Array[Int](n)
    var i = 0
    while (i < n) {
      val j = i + order
      r(i) = order match {
        case 0 => s(j)
        case 1 => s(j) - s(j - 1)
        case 2 => s(j) - 2 * s(j - 1) + s(j - 2)
        case 3 => s(j) - 3 * s(j - 1) + 3 * s(j - 2) - s(j - 3)
        case _ => s(j) - 4 * s(j - 1) + 6 * s(j - 2) - 4 * s(j - 3) + s(j - 4)
      }
      i += 1
    }
    r
  }

  private def writeSubframe(bw: BitWriter, s: Array[Int], bps: Int): Unit = {
    val allEqual = s.forall(_ == s(0))
    if (allEqual) {
      bw.put(0, 1); bw.put(0x00, 6); bw.put(0, 1) // CONSTANT
      bw.put(s(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    // pick the fixed order (0..4, capped by blocksize) with min Σ|residual|
    val maxOrder = math.min(4, s.length - 1)
    var best = 0
    var bestCost = Long.MaxValue
    var o = 0
    while (o <= maxOrder) {
      val r = fixedResidual(s, o)
      var c = 0L
      var i = 0
      while (i < r.length) { c += math.abs(r(i).toLong); i += 1 }
      if (c < bestCost) { bestCost = c; best = o }
      o += 1
    }
    val res = fixedResidual(s, best)
    bw.put(0, 1); bw.put(0x08 | best, 6); bw.put(0, 1) // FIXED, order `best`
    var i = 0
    while (i < best) { bw.put(s(i).toLong & ((1L << bps) - 1), bps); i += 1 } // warmup
    // single-partition Rice, method 00 (4-bit parameter)
    val mean = if (res.isEmpty) 0L else {
      var m = 0L
      res.foreach(r => m += (((r << 1) ^ (r >> 31)).toLong & 0xFFFFFFFFL))
      m / math.max(1, res.length)
    }
    var p = 0
    while ((1L << (p + 1)) <= mean + 1 && p < 14) p += 1
    bw.put(0, 2) // rice method 00
    bw.put(0, 4) // partition order 0
    bw.put(p, 4)
    res.foreach { r =>
      val u = ((r << 1) ^ (r >> 31)).toLong & 0xFFFFFFFFL
      bw.putUnary((u >>> p).toInt)
      if (p > 0) bw.put(u & ((1L << p) - 1), p)
    }
  }

  /** Encode interleaved 16-bit samples (1 or 2 channels, independent
    * coding) to a FLAC stream: fLaC + STREAMINFO + fixed-blocksize frames
    * with per-frame fixed-predictor order search. Lossless: decode
    * returns the input bit-for-bit. */
  def encode(rate: Int, channels: Int, samples: Array[Int], blockSize: Int = 4096): Array[Byte] = {
    require(channels == 1 || channels == 2, "encoder: mono or stereo")
    require(samples.length % channels == 0, "interleave must be complete")
    require(rate > 0 && blockSize >= 16, "bad rate/blockSize")
    val bps = 16
    val nSamples = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    out.write(Multimodal.flacHeader(rate, channels, bps, nSamples), 0, 42)
    var frame = 0L
    var off = 0
    while (off < nSamples) {
      val bs = math.min(blockSize, nSamples - off)
      val bw = new BitWriter
      bw.put(0x3FFE, 14) // sync
      bw.put(0, 1) // reserved
      bw.put(0, 1) // fixed blocksize strategy
      bw.put(0x7, 4) // blocksize: 16-bit at end
      bw.put(0, 4) // sample rate: from STREAMINFO
      bw.put(channels - 1, 4) // independent channels
      bw.put(0x4, 3) // 16-bit samples
      bw.put(0, 1) // reserved
      utf8FrameNum(bw, frame)
      bw.put(bs - 1, 16)
      val headerBytes = bw.bytes // byte-aligned here by construction
      val hdrOut = new java.io.ByteArrayOutputStream()
      hdrOut.write(headerBytes, 0, headerBytes.length)
      hdrOut.write(crc8(headerBytes, 0, headerBytes.length))
      val body = new BitWriter
      var ch = 0
      while (ch < channels) {
        val s = new Array[Int](bs)
        var i = 0
        while (i < bs) { s(i) = samples((off + i) * channels + ch); i += 1 }
        writeSubframe(body, s, bps)
        ch += 1
      }
      val bodyBytes = body.bytes // zero-padded to byte boundary (spec)
      hdrOut.write(bodyBytes, 0, bodyBytes.length)
      val frameBytes = hdrOut.toByteArray
      val c16 = crc16(frameBytes, 0, frameBytes.length)
      out.write(frameBytes, 0, frameBytes.length)
      out.write((c16 >>> 8) & 0xFF); out.write(c16 & 0xFF)
      frame += 1
      off += bs
    }
    out.toByteArray
  }

  // --------------------------------------------------------------- decode

  /** Exact integer samples: (rate, channels, bps, interleaved samples).
    * None (never throws) for anything outside the decoder scope above. */
  def decodeSamples(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = try {
    if (bytes == null || bytes.length < 42 || Multimodal.sniffMagic(bytes) != "flac") return None
    val meta = Multimodal.flacMeta(bytes) // validates STREAMINFO framing
    if (meta.isEmpty) return None
    def u8(i: Int) = bytes(i) & 0xFF
    // skip metadata blocks to the first frame
    var pos = 4
    var last = false
    while (!last) {
      if (pos + 4 > bytes.length) return None
      last = (u8(pos) & 0x80) != 0
      val len = (u8(pos + 1) << 16) | (u8(pos + 2) << 8) | u8(pos + 3)
      pos += 4 + len
      if (pos > bytes.length) return None
    }
    val streamRate = (u8(18) << 12) | (u8(19) << 4) | (u8(20) >>> 4)
    val streamBps = (((u8(20) & 0x1) << 4) | (u8(21) >>> 4)) + 1
    val totalSamples = ((u8(21) & 0xF).toLong << 32) | (u8(22).toLong << 24) |
      (u8(23).toLong << 16) | (u8(24).toLong << 8) | u8(25).toLong
    if (totalSamples <= 0 || totalSamples > (1L << 26)) return None

    val chunks = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    var decoded = 0L
    var channels = -1

    while (decoded < totalSamples && pos + 2 <= bytes.length) {
      val br = new BitReader(bytes, pos)
      if (br.bits(14) != 0x3FFE) return None
      br.bits(1) // reserved
      br.bits(1) // blocking strategy (frame/sample number both skipped below)
      val bsCode = br.bits(4)
      val srCode = br.bits(4)
      val chanAsgn = br.bits(4)
      val ssCode = br.bits(3)
      br.bits(1)
      // UTF-8 coded number: lead byte determines length
      val lead = br.bits(8)
      var extra = 0
      var l = lead
      while ((l & 0x80) != 0) { extra += 1; l <<= 1 }
      if (extra == 1 || extra > 6) return None
      var k = 0
      while (k < math.max(0, extra - 1)) {
        if ((br.bits(8) & 0xC0) != 0x80) return None
        k += 1
      }
      val blockSize = bsCode match {
        case 0 => return None
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.bits(8) + 1
        case 7 => br.bits(16) + 1
        case c => 256 << (c - 8)
      }
      if (srCode == 12) br.bits(8)
      else if (srCode == 13 || srCode == 14) br.bits(16)
      else if (srCode == 15) return None
      val bps = ssCode match {
        case 0 => streamBps
        case 1 => 8; case 2 => 12; case 4 => 16; case 5 => 20; case 6 => 24
        case _ => return None
      }
      val nCh = if (chanAsgn < 8) chanAsgn + 1 else 2
      if (channels < 0) channels = nCh else if (channels != nCh) return None
      // CRC-8 covers the header bytes read so far (reader is byte-aligned:
      // sync..blocksize fields total a whole number of bytes)
      val hdrEnd = br.pos
      if (br.bits(8) != crc8(bytes, pos, hdrEnd)) return None
      if (blockSize <= 0 || blockSize > (1 << 20)) return None

      val chans = new Array[Array[Int]](nCh)
      var c = 0
      while (c < nCh) {
        val chBps = chanAsgn match {
          case 8 => if (c == 1) bps + 1 else bps // left/side
          case 9 => if (c == 0) bps + 1 else bps // side/right
          case 10 => if (c == 1) bps + 1 else bps // mid/side
          case _ => bps
        }
        chans(c) = readSubframe(br, blockSize, chBps).getOrElse(return None)
        c += 1
      }
      br.alignByte()
      br.bits(16) // frame CRC-16 (validated below over the whole frame)
      if (br.bad) return None
      val frameEnd = br.pos
      val c16 = ((bytes(frameEnd - 2) & 0xFF) << 8) | (bytes(frameEnd - 1) & 0xFF)
      if (crc16(bytes, pos, frameEnd - 2) != c16) return None

      // stereo decorrelation
      chanAsgn match {
        case 8 => // left/side: right = left - side
          var i = 0
          while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
        case 9 => // side/right: left = right + side
          var i = 0
          while (i < blockSize) { chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
        case 10 => // mid/side
          var i = 0
          while (i < blockSize) {
            val s = chans(1)(i)
            var m = chans(0)(i) << 1
            m |= (s & 1)
            chans(0)(i) = (m + s) >> 1
            chans(1)(i) = (m - s) >> 1
            i += 1
          }
        case _ => ()
      }
      val take = math.min(blockSize.toLong, totalSamples - decoded).toInt
      val inter = new Array[Int](take * nCh)
      var i = 0
      while (i < take) {
        var cc = 0
        while (cc < nCh) { inter(i * nCh + cc) = chans(cc)(i); cc += 1 }
        i += 1
      }
      chunks += inter
      decoded += take
      pos = frameEnd
    }
    if (decoded < totalSamples) return None
    val total = chunks.map(_.length).sum
    val all = new Array[Int](total)
    var o = 0
    chunks.foreach { c => System.arraycopy(c, 0, all, o, c.length); o += c.length }
    val outRate = if (streamRate > 0) streamRate else return None
    Some((outRate, channels, streamBps, all))
  } catch { case _: Throwable => None }

  private def readSubframe(br: BitReader, blockSize: Int, bps: Int): Option[Array[Int]] = {
    if (br.bits(1) != 0) return None
    val typ = br.bits(6)
    val wastedFlag = br.bits(1)
    val wasted = if (wastedFlag == 1) br.unary() + 1 else 0
    if (wasted < 0) return None
    val eff = bps - wasted
    if (eff <= 0 || eff > 32) return None
    val out = new Array[Int](blockSize)
    if (typ == 0x00) { // CONSTANT
      val v = br.signedBits(eff)
      java.util.Arrays.fill(out, v)
    } else if (typ == 0x01) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = br.signedBits(eff); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
      val order = typ & 0x07
      var i = 0
      while (i < order) { out(i) = br.signedBits(eff); i += 1 }
      if (!readResiduals(br, blockSize, order, out)) return None
      i = order
      while (i < blockSize) {
        out(i) += (order match {
          case 0 => 0
          case 1 => out(i - 1)
          case 2 => 2 * out(i - 1) - out(i - 2)
          case 3 => 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
          case _ => 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) - out(i - 4)
        })
        i += 1
      }
    } else if ((typ & 0x20) != 0) { // LPC, order = (typ & 0x1F) + 1
      val order = (typ & 0x1F) + 1
      if (order > blockSize) return None
      var i = 0
      while (i < order) { out(i) = br.signedBits(eff); i += 1 }
      val precision = br.bits(4) + 1
      if (precision > 15) return None
      val shift = (br.bits(5) << 27) >> 27 // signed 5-bit
      if (shift < 0) return None
      val coef = new Array[Int](order)
      i = 0
      while (i < order) { coef(i) = br.signedBits(precision); i += 1 }
      if (!readResiduals(br, blockSize, order, out)) return None
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coef(j).toLong * out(i - 1 - j); j += 1 }
        out(i) += (acc >> shift).toInt
        i += 1
      }
    } else return None
    if (br.bad) return None
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
    }
    Some(out)
  }

  /** Partitioned Rice residuals, written into out(order until blockSize). */
  private def readResiduals(br: BitReader, blockSize: Int, order: Int, out: Array[Int]): Boolean = {
    val method = br.bits(2)
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = br.bits(4)
    val parts = 1 << partOrder
    if (blockSize % parts != 0) return false
    var idx = order
    var part = 0
    while (part < parts) {
      val count = (blockSize >>> partOrder) - (if (part == 0) order else 0)
      if (count < 0) return false
      val param = br.bits(pBits)
      if (param == escape) {
        val raw = br.bits(5)
        var i = 0
        while (i < count) { out(idx) = if (raw == 0) 0 else br.signedBits(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = br.unary()
          if (q < 0) return false
          val u = (q.toLong << param) | (if (param > 0) br.bits(param).toLong & ((1L << param) - 1) else 0L)
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt // un-zigzag
          idx += 1; i += 1
        }
      }
      part += 1
    }
    !br.bad
  }

  /** Float contract twin of [[Multimodal.decodeWavPcm]]: (rate, channels,
    * interleaved samples normalized by 2^(bps-1)). */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    decodeSamples(bytes).map { case (rate, ch, bps, s) =>
      val scale = 1f / (1 << (bps - 1))
      val f = new Array[Float](s.length)
      var i = 0
      while (i < s.length) { f(i) = s(i) * scale; i += 1 }
      (rate, ch, f)
    }
}

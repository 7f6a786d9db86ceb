package dedup

import java.nio.charset.StandardCharsets.UTF_8

/** Self-contained hash functions for shingling, banding and ids.
  *
  * xxh32/xxh64 are implemented from the public xxHash specification
  * (github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md). The reference
  * engine hashes shingles with `xxhash.xxh32_intdigest` (seed 0) — see
  * reference fuzzy_spark2.py:119-148 — so we need a bit-identical xxh32 to
  * run at "identical shingle/signature config". xxh64 doubles as the band /
  * id hash; it matches Spark's built-in `xxhash64` (seed 42) on UTF-8
  * strings, which the test-suite asserts.
  *
  * MinHash permutation math follows reference fuzzy_spark2.py:34-36,231-235:
  * lanes are `min((h*a + b) mod p) & 0xFFFFFFFF` over the shingle-hash set,
  * p = 4294967291 (largest 32-bit prime), empty set => MAX_HASH.
  */
object Hashes {

  // ---------------------------------------------------------------- xxh32
  private final val P32_1 = 0x9E3779B1 // 2654435761
  private final val P32_2 = 0x85EBCA77 // 2246822519
  private final val P32_3 = 0xC2B2AE3D // 3266489917
  private final val P32_4 = 0x27D4EB2F // 668265263
  private final val P32_5 = 0x165667B1 // 374761393

  @inline private def le32(d: Array[Byte], i: Int): Int =
    (d(i) & 0xFF) | ((d(i + 1) & 0xFF) << 8) | ((d(i + 2) & 0xFF) << 16) | ((d(i + 3) & 0xFF) << 24)

  def xxh32(data: Array[Byte], seed: Int): Int = {
    val len = data.length
    var idx = 0
    var acc = 0
    if (len >= 16) {
      var v1 = seed + P32_1 + P32_2
      var v2 = seed + P32_2
      var v3 = seed
      var v4 = seed - P32_1
      val limit = len - 16
      while (idx <= limit) {
        v1 = Integer.rotateLeft(v1 + le32(data, idx) * P32_2, 13) * P32_1
        v2 = Integer.rotateLeft(v2 + le32(data, idx + 4) * P32_2, 13) * P32_1
        v3 = Integer.rotateLeft(v3 + le32(data, idx + 8) * P32_2, 13) * P32_1
        v4 = Integer.rotateLeft(v4 + le32(data, idx + 12) * P32_2, 13) * P32_1
        idx += 16
      }
      acc = Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
        Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
    } else {
      acc = seed + P32_5
    }
    acc += len
    while (idx + 4 <= len) {
      acc = Integer.rotateLeft(acc + le32(data, idx) * P32_3, 17) * P32_4
      idx += 4
    }
    while (idx < len) {
      acc = Integer.rotateLeft(acc + (data(idx) & 0xFF) * P32_5, 11) * P32_1
      idx += 1
    }
    acc ^= acc >>> 15
    acc *= P32_2
    acc ^= acc >>> 13
    acc *= P32_3
    acc ^= acc >>> 16
    acc
  }

  def xxh32Str(s: String, seed: Int = 0): Int = xxh32(s.getBytes(UTF_8), seed)

  // ---------------------------------------------------------------- xxh64
  private final val P64_1 = 0x9E3779B185EBCA87L
  private final val P64_2 = 0xC2B2AE3D27D4EB4FL
  private final val P64_3 = 0x165667B19E3779F9L
  private final val P64_4 = 0x85EBCA77C2B2AE63L
  private final val P64_5 = 0x27D4EB2F165667C5L

  @inline private def le64(d: Array[Byte], i: Int): Long =
    (le32(d, i).toLong & 0xFFFFFFFFL) | (le32(d, i + 4).toLong << 32)

  @inline private def round64(acc: Long, lane: Long): Long =
    java.lang.Long.rotateLeft(acc + lane * P64_2, 31) * P64_1

  @inline private def merge64(acc: Long, v: Long): Long =
    (acc ^ round64(0L, v)) * P64_1 + P64_4

  def xxh64(data: Array[Byte], seed: Long): Long = xxh64(data, data.length, seed)

  /** xxh64 over data[0, len) — lets callers reuse a scratch buffer. */
  def xxh64(data: Array[Byte], len: Int, seed: Long): Long = {
    var idx = 0
    var acc = 0L
    if (len >= 32) {
      var v1 = seed + P64_1 + P64_2
      var v2 = seed + P64_2
      var v3 = seed
      var v4 = seed - P64_1
      val limit = len - 32
      while (idx <= limit) {
        v1 = round64(v1, le64(data, idx))
        v2 = round64(v2, le64(data, idx + 8))
        v3 = round64(v3, le64(data, idx + 16))
        v4 = round64(v4, le64(data, idx + 24))
        idx += 32
      }
      acc = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      acc = merge64(acc, v1)
      acc = merge64(acc, v2)
      acc = merge64(acc, v3)
      acc = merge64(acc, v4)
    } else {
      acc = seed + P64_5
    }
    acc += len
    while (idx + 8 <= len) {
      acc = java.lang.Long.rotateLeft(acc ^ round64(0L, le64(data, idx)), 27) * P64_1 + P64_4
      idx += 8
    }
    if (idx + 4 <= len) {
      acc = java.lang.Long.rotateLeft(acc ^ ((le32(data, idx).toLong & 0xFFFFFFFFL) * P64_1), 23) * P64_2 + P64_3
      idx += 4
    }
    while (idx < len) {
      acc = java.lang.Long.rotateLeft(acc ^ ((data(idx) & 0xFF) * P64_5), 11) * P64_1
      idx += 1
    }
    acc ^= acc >>> 33
    acc *= P64_2
    acc ^= acc >>> 29
    acc *= P64_3
    acc ^= acc >>> 32
    acc
  }

  def xxh64Str(s: String, seed: Long = 0L): Long = xxh64(s.getBytes(UTF_8), seed)

  /** xxh64 of a single long (little-endian 8 bytes), allocation-free. */
  def xxh64Long(value: Long, seed: Long): Long = {
    var acc = seed + P64_5 + 8L
    acc = java.lang.Long.rotateLeft(acc ^ round64(0L, value), 27) * P64_1 + P64_4
    acc ^= acc >>> 33
    acc *= P64_2
    acc ^= acc >>> 29
    acc *= P64_3
    acc ^= acc >>> 32
    acc
  }

  /** xxh64 over an int-array slice (LE byte order), used for LSH band keys. */
  def xxh64Ints(ints: Array[Int], from: Int, until: Int, seed: Long): Long =
    xxh64Ints(ints, from, until, seed, new Array[Byte]((until - from) * 4))

  /** Scratch-buffer variant: zero allocation when the caller reuses one
    * buffer per partition (25 band keys per doc otherwise allocate 25
    * small arrays each). */
  def xxh64Ints(ints: Array[Int], from: Int, until: Int, seed: Long,
      scratch: Array[Byte]): Long = {
    val n = until - from
    var i = 0
    while (i < n) {
      val v = ints(from + i)
      scratch(i * 4) = v.toByte
      scratch(i * 4 + 1) = (v >>> 8).toByte
      scratch(i * 4 + 2) = (v >>> 16).toByte
      scratch(i * 4 + 3) = (v >>> 24).toByte
      i += 1
    }
    xxh64(scratch, n * 4, seed)
  }

  /** Streaming xxh32: feed bytes incrementally, bit-identical to the
    * one-shot `xxh32`. Exists so the shingler can hash token bytes + joiner
    * spaces without materializing a String/StringBuilder per shingle — at
    * 32 mutator threads the per-shingle garbage otherwise costs ~23% of
    * wall in GC (BENCH/BASELINE.md round-1 diagnosis). */
  final class Xxh32Stream(seed: Int) {
    private var v1 = seed + P32_1 + P32_2
    private var v2 = seed + P32_2
    private var v3 = seed
    private var v4 = seed - P32_1
    private val buf = new Array[Byte](16)
    private var bufLen = 0
    private var total = 0L

    def reset(): Unit = {
      v1 = seed + P32_1 + P32_2; v2 = seed + P32_2; v3 = seed; v4 = seed - P32_1
      bufLen = 0; total = 0L
    }

    def update(b: Byte): Unit = {
      buf(bufLen) = b
      bufLen += 1
      total += 1
      if (bufLen == 16) { processBuf(); bufLen = 0 }
    }

    def update(data: Array[Byte], off: Int, len: Int): Unit = {
      var i = off
      val end = off + len
      // drain into a partially filled buffer first
      while (bufLen != 0 && i < end) {
        buf(bufLen) = data(i)
        bufLen += 1
        total += 1
        i += 1
        if (bufLen == 16) { processBuf(); bufLen = 0 }
      }
      // bulk 16-byte stripes straight from the source array
      while (end - i >= 16) {
        v1 = Integer.rotateLeft(v1 + le32(data, i) * P32_2, 13) * P32_1
        v2 = Integer.rotateLeft(v2 + le32(data, i + 4) * P32_2, 13) * P32_1
        v3 = Integer.rotateLeft(v3 + le32(data, i + 8) * P32_2, 13) * P32_1
        v4 = Integer.rotateLeft(v4 + le32(data, i + 12) * P32_2, 13) * P32_1
        i += 16
        total += 16
      }
      while (i < end) { update(data(i)); i += 1 }
    }

    private def processBuf(): Unit = {
      v1 = Integer.rotateLeft(v1 + le32(buf, 0) * P32_2, 13) * P32_1
      v2 = Integer.rotateLeft(v2 + le32(buf, 4) * P32_2, 13) * P32_1
      v3 = Integer.rotateLeft(v3 + le32(buf, 8) * P32_2, 13) * P32_1
      v4 = Integer.rotateLeft(v4 + le32(buf, 12) * P32_2, 13) * P32_1
    }

    /** digest without destroying state-reuse: call reset() before next use */
    def digest(): Int = {
      var acc =
        if (total >= 16)
          Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
            Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
        else v3 + P32_5 // v3 == seed when total < 16
      acc += total.toInt
      var idx = 0
      while (idx + 4 <= bufLen) {
        acc = Integer.rotateLeft(acc + le32(buf, idx) * P32_3, 17) * P32_4
        idx += 4
      }
      while (idx < bufLen) {
        acc = Integer.rotateLeft(acc + (buf(idx) & 0xFF) * P32_5, 11) * P32_1
        idx += 1
      }
      acc ^= acc >>> 15
      acc *= P32_2
      acc ^= acc >>> 13
      acc *= P32_3
      acc ^= acc >>> 16
      acc
    }
  }

  // ------------------------------------------------------------- MinHash
  /** Largest 32-bit prime; reference fuzzy_spark2.py:36 (MOD_PRIME). */
  final val ModPrime: Long = 4294967291L

  /** x mod ModPrime for any unsigned 64-bit x, division-free: with
    * p = 2³² − 5, 2³² ≡ 5 (mod p), so folding the high word (×5) twice
    * leaves a value < 2³²+29 and at most two conditional subtracts finish.
    * ~3× faster than Long.remainderUnsigned in the 250-lane MinHash inner
    * loop; equivalence is exhaustively property-tested in HashesSpec. */
  @inline final def mod32m5(x: Long): Long = {
    var y = (x >>> 32) * 5L + (x & 0xFFFFFFFFL)
    y = (y >>> 32) * 5L + (y & 0xFFFFFFFFL)
    if (y >= ModPrime) y -= ModPrime
    if (y >= ModPrime) y -= ModPrime
    y
  }
  /** Empty-shingle-set lane value; reference fuzzy_spark2.py:35 (MAX_HASH). */
  final val MaxHash: Long = 4294967295L

  /** Deterministic universal-hash permutations (a in [1,p), b in [0,p)).
    *
    * The reference draws them from numpy RandomState(seed)
    * (fuzzy_spark2.py:542-545); bit-compat with numpy is NOT required (the
    * recall gate compares dup *pairs*, not signatures — SURVEY.md §2.4 F9),
    * so we derive them from xxh64 counters: splittable, seedable and
    * identical at any parallelism.
    */
  def permutations(numPerm: Int, seed: Long): (Array[Long], Array[Long]) = {
    val a = new Array[Long](numPerm)
    val b = new Array[Long](numPerm)
    var i = 0
    while (i < numPerm) {
      a(i) = 1L + java.lang.Long.remainderUnsigned(xxh64Long(2L * i, seed), ModPrime - 1L)
      b(i) = java.lang.Long.remainderUnsigned(xxh64Long(2L * i + 1L, seed ^ 0x5DEECE66DL), ModPrime)
      i += 1
    }
    (a, b)
  }
}

package dedup

import org.scalatest.funsuite.AnyFunSuite

class HashesSpec extends AnyFunSuite {

  test("xxh32 published test vectors (seed 0)") {
    // vectors from the public xxHash spec / widely published references
    assert(Hashes.xxh32Str("") === 0x02CC5D05)
    assert(Hashes.xxh32Str("a") === 0x550D7456)
    assert(Hashes.xxh32Str("abc") === 0x32D153FF)
    assert(Hashes.xxh32Str("abcd") === 0xA3643705)
  }

  test("xxh32 long-input path (>=16 bytes) is stable and spreads") {
    val h1 = Hashes.xxh32Str("the quick brown fox jumps over the lazy dog")
    val h2 = Hashes.xxh32Str("the quick brown fox jumps over the lazy dot")
    assert(h1 !== h2)
    assert(h1 === Hashes.xxh32Str("the quick brown fox jumps over the lazy dog"))
  }

  test("xxh64 published test vectors (seed 0)") {
    assert(Hashes.xxh64Str("") === 0xEF46DB3751D8E999L)
    assert(Hashes.xxh64Str("a") === 0xD24EC4F1A98C6E5BL)
    assert(Hashes.xxh64Str("abc") === 0x44BC2CF5AD770999L)
  }

  test("xxh64 matches Spark's built-in xxhash64 (seed 42) on random strings") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val strings = (0 until 200).map { i =>
      val len = i % 50
      new String(Array.tabulate(len)(j => ('a' + (i * 31 + j * 7) % 26).toChar)) +
        (if (i % 3 == 0) " ünïcødé 文字" else "")
    }
    val got = strings.toDF("s").select(col("s"), xxhash64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strings.foreach { s =>
      assert(Hashes.xxh64Str(s, 42L) === got(s), s"mismatch on '$s'")
    }
  }

  test("xxh64Long agrees with byte-array xxh64") {
    for (v <- Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 0xDEADBEEFL)) {
      val bytes = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
      assert(Hashes.xxh64Long(v, 7L) === Hashes.xxh64(bytes, 7L))
    }
  }

  test("permutations: deterministic, correct ranges") {
    val (a1, b1) = Hashes.permutations(250, 42L)
    val (a2, b2) = Hashes.permutations(250, 42L)
    assert(a1.toSeq === a2.toSeq)
    assert(b1.toSeq === b2.toSeq)
    assert(a1.forall(x => x >= 1 && x < Hashes.ModPrime))
    assert(b1.forall(x => x >= 0 && x < Hashes.ModPrime))
    val (a3, _) = Hashes.permutations(250, 43L)
    assert(a1.toSeq !== a3.toSeq)
  }

  test("mod32m5 == Long.remainderUnsigned(x, ModPrime) (property + edges)") {
    val edges = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue,
      Hashes.ModPrime, Hashes.ModPrime - 1, Hashes.ModPrime + 1,
      0xFFFFFFFFL, 0x100000000L, -5L, -4L)
    val rnd = new scala.util.Random(42)
    val xs = edges ++ (0 until 100000).map(_ => rnd.nextLong())
    xs.foreach { x =>
      assert(Hashes.mod32m5(x) === java.lang.Long.remainderUnsigned(x, Hashes.ModPrime),
        s"x=$x")
    }
  }

  test("Xxh32Stream bulk update == one-shot xxh32 under arbitrary chunkings") {
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 200) {
      val data = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(data)
      val s = new Hashes.Xxh32Stream(0)
      var off = 0
      while (off < data.length) {
        val chunk = math.min(1 + rnd.nextInt(40), data.length - off)
        s.update(data, off, chunk)
        off += chunk
      }
      assert(s.digest() === Hashes.xxh32(data, 0), s"len=${data.length}")
      s.reset()
    }
  }

  test("xxh64Ints scratch variant == allocating variant") {
    val ints = Array.tabulate(40)(i => i * 31 - 7)
    val scratch = new Array[Byte](40)
    for (from <- Seq(0, 3); until <- Seq(5, 10)) {
      assert(Hashes.xxh64Ints(ints, from, until, 9L) ===
        Hashes.xxh64Ints(ints, from, until, 9L, scratch))
    }
  }
}

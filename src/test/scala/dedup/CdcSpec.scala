package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class CdcSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def randBytes(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val a = new Array[Byte](n); r.nextBytes(a); a
  }

  test("boundaries: definition replay, coverage, expected size, min/max bounds") {
    val data = randBytes(20000, 1L)
    val chunks = Cdc.boundaries(data, maskBits = 6)
    // chunks tile the blob exactly
    assert(chunks.head._1 === 0)
    assert(chunks.map(_._2).sum === data.length)
    for (k <- 1 until chunks.length)
      assert(chunks(k)._1 === chunks(k - 1)._1 + chunks(k - 1)._2, s"gap at $k")
    // every interior cut satisfies the boundary rule, replayed from the
    // definition with independent BigInt arithmetic
    var h = BigInt(0)
    val cuts = chunks.dropRight(1).map(c => c._1 + c._2 - 1).toSet
    val isTailCut = { // last chunk may end by EOF rather than by rule
      val lastEnd = data.length - 1
      cuts.contains(lastEnd)
    }
    for (i <- data.indices) {
      h = (h * 2 + (BigInt((data(i) & 0xFF) + 1) * BigInt(2654435761L)) % BigInt(4294967296L)) % BigInt(4294967296L)
      val isCut = (h % 64) == 0
      if (cuts.contains(i)) assert(isCut, s"cut at $i fails the rule")
      else if (i < data.length - 1) assert(!isCut, s"missed cut at $i")
    }
    assert(!isTailCut || true) // tail may or may not end on a rule cut
    // expected chunk size ~ 2^6 on random data (loose statistical bound)
    val avg = data.length.toDouble / chunks.length
    assert(avg > 32 && avg < 128, s"avg chunk $avg far from 64")
    // min/max bounds are hard limits
    val bounded = Cdc.boundaries(data, 6, minSize = 48, maxSize = 100)
    assert(bounded.map(_._2).sum === data.length)
    assert(bounded.dropRight(1).forall(c => c._2 >= 48 && c._2 <= 100))
    assert(bounded.last._2 <= 100)
    // degenerate inputs
    assert(Cdc.boundaries(Array.emptyByteArray, 6) === Seq.empty)
    assert(Cdc.boundaries(null, 6) === Seq.empty)
    val one = Cdc.boundaries(Array[Byte](42), 6)
    assert(one === Seq((0, 1)))
  }

  test("self-synchronization: shared content chunks identically after the 32-byte horizon") {
    val shared = randBytes(4000, 7L)
    val a = randBytes(137, 8L) ++ shared // different, unaligned prefixes
    val b = randBytes(53, 9L) ++ shared
    def sharedChunks(blob: Array[Byte], skip: Int): Seq[(Int, Int)] =
      Cdc.boundaries(blob, 6)
        .filter { case (off, len) => off >= skip + 32 && off + len <= blob.length - 64 }
        .map { case (off, len) => (off - skip, len) } // normalize to shared coords
    val ca = sharedChunks(a, 137)
    val cb = sharedChunks(b, 53)
    // interior chunks of the shared region coincide exactly (the first
    // post-prefix chunk may differ while the rolling hash flushes)
    val ints = ca.toSet intersect cb.toSet
    assert(ints.size >= math.min(ca.size, cb.size) - 1,
      s"shared-region chunking diverged: ${ca.size}/${cb.size}/${ints.size}")
    assert(ints.size >= 20, "fixture too small to be meaningful")
  }

  test("chunkStats: exact copy fully dup, shifted copy mostly dup, first-owner rule, empties") {
    import spark.implicits._
    val base = randBytes(6000, 21L)
    val shifted = randBytes(41, 22L) ++ base
    val rows = Seq(
      (1L, base),
      (2L, base.clone()),              // byte-identical copy
      (3L, shifted),                   // shifted copy: CDC still finds it
      (4L, randBytes(6000, 23L)),      // unrelated
      (5L, Array.emptyByteArray),      // empty
      (6L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("id", "bin")
    val stats = Cdc.chunkStats(df, "id", "bin", maskBits = 6)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (n1, b1, d1, db1) = stats(1L)
    assert(b1 === 6000L && d1 >= 0L)
    // id 2 duplicates id 1 chunk-for-chunk
    val (n2, b2, d2, db2) = stats(2L)
    assert(n2 === n1 && b2 === 6000L && d2 === n2 && db2 === 6000L)
    // id 3: all but the prefix-adjacent head duplicates id 1
    val (_, b3, _, db3) = stats(3L)
    assert(b3 === 6041L)
    assert(db3 > 5000L, s"shifted copy should dedup most bytes, got $db3")
    // id 4 shares nothing material
    assert(stats(4L)._4 < 500L)
    // empty/null rows present with zeros
    assert(stats(5L) === ((0L, 0L, 0L, 0L)))
    assert(stats(6L) === ((0L, 0L, 0L, 0L)))
    // partition-layout invariance
    val again = Cdc.chunkStats(df.repartition(7), "id", "bin", 6)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(again === stats)
  }

  test("newChunkStats: batch-vs-corpus chunk novelty — exact copies, shifted copies, " +
      "fresh blobs; Bloom false positives never inflate counts") {
    import spark.implicits._
    val corpusBlobs = Seq(
      (100L, randBytes(5000, 31L)),
      (101L, randBytes(5000, 32L)),
      (102L, randBytes(5000, 33L)))
    val corpus = corpusBlobs.toDF("id", "bin")
    val index = Cdc.chunkIndex(corpus, "id", "bin", maskBits = 6)
    val batch = Seq(
      (1L, corpusBlobs.head._2.clone()),                  // exact corpus copy
      (2L, randBytes(37, 40L) ++ corpusBlobs(1)._2),      // shifted corpus copy
      (3L, randBytes(5000, 41L)),                         // storage-new
      (4L, Array.emptyByteArray)).toDF("id", "bin")
    val stats = Cdc.newChunkStats(index, batch, "id", "bin", maskBits = 6)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (n1, b1, d1, db1) = stats(1L)
    assert(b1 === 5000L && d1 === n1 && db1 === 5000L, "exact copy fully dup")
    assert(stats(2L)._4 > 4000L, s"shifted copy mostly dup, got ${stats(2L)._4}")
    assert(stats(4L) === ((0L, 0L, 0L, 0L)))
    // the confirm join must kill Bloom false positives EXACTLY: compare
    // the fresh blob's dup accounting against brute-force set membership
    val idxKeys = index.collect().map(_.getLong(0)).toSet
    val freshChunks = Cdc.chunkHashes(randBytes(5000, 41L), 6)
    val trueDup = freshChunks.count(c => idxKeys.contains(c._3))
    val trueDupBytes = freshChunks.filter(c => idxKeys.contains(c._3)).map(_._2.toLong).sum
    assert(stats(3L)._3 === trueDup.toLong, "dup_chunks must be exact, not fpp-inflated")
    assert(stats(3L)._4 === trueDupBytes)
    // a HIGH-fpp bloom still yields identical (exact) accounting
    val sloppy = Cdc.newChunkStats(index, batch, "id", "bin", 6, fpp = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(sloppy === stats)
    // expectedItems (caller-known index cardinality, skipping the count()
    // scan) must not change the accounting — even wildly oversized
    val sized = Cdc.newChunkStats(index, batch, "id", "bin", 6,
        expectedItems = 1000000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(sized === stats)
  }

  test("pipeline --cdc-report: storage-audit artifact over the kept corpus text") {
    val dir = java.nio.file.Files.createTempDirectory("pipecdc").toString
    val args = Pipeline.parse(Array("--synth", "300", "--output", dir,
      "--cdc-report", "6"))
    val (kept, _) = Pipeline.run(spark, args)
    val report = spark.read.parquet(s"$dir/cdc_report")
    assert(report.columns.toSeq ===
      Seq("id", "n_chunks", "n_bytes", "dup_chunks", "dup_bytes"))
    assert(report.count() === kept.count())
    // total chunked bytes = total utf-8 text bytes of the kept corpus
    val tb = report.agg(sum(col("n_bytes"))).collect()(0).getLong(0)
    val expect = kept.select(sum(length(encode(coalesce(col("text"), lit("")),
      "UTF-8")))).collect()(0).getLong(0)
    assert(tb === expect)
    // mask-bits validation
    intercept[IllegalArgumentException] {
      Pipeline.parse(Array("--synth", "10", "--output", dir, "--cdc-report", "40"))
    }
  }
}

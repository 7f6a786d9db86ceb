package dedup

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming dedup: exact bounded-state dedup, incremental
  * MinHash-LSH near-dup flags, cross-batch state persistence, and
  * stream ≡ batch-twin equivalence on event-time-monotonic slicings. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private val cfg = DedupConfig(
    idCol = "id", textCol = "text",
    ngram = 5, minLength = 5, numPerm = 250, threshold = 0.7, seed = 42L)

  private def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  // base doc + a near-dup mutator: one token swapped out of 80 keeps
  // shingle-Jaccard ~0.94, well above threshold 0.7
  private def doc(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until 80).map(_ => s"w${rnd.nextInt(500)}").mkString(" ")
  }
  private def mutate(text: String, at: Int): String = {
    val toks = text.split(" "); toks(at) = "zzz" + at; toks.mkString(" ")
  }

  test("exactKept drops byte-identical copies within the watermark, keeps firsts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val pages = in.toDF().toDF("id", "warc_ts", "text")
    val q = StreamingDedup.exactKept(pages)
      .writeStream.format("memory").queryName("exact_out").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sd-exact").toString)
      .start()
    try {
      val a = doc(1); val c = doc(3)
      in.addData((1L, ts(0), a), (2L, ts(1), a), (3L, ts(1), c))
      q.processAllAvailable()
      in.addData((4L, ts(2), a), (5L, ts(2), doc(5)))
      q.processAllAvailable()
      val kept = spark.table("exact_out").select("id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 3L, 5L), "first copy of each content passes; later copies drop")
    } finally q.stop()
  }

  test("fuzzyMatches flags near-dups against the first-seen rep, across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val pages = in.toDF().toDF("id", "warc_ts", "text")
    val q = StreamingDedup.fuzzyMatches(pages, cfg)
      .writeStream.format("memory").queryName("fuzzy_out").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sd-fuzzy").toString)
      .start()
    try {
      val a = doc(10)
      in.addData((1L, ts(0), a), (2L, ts(1), mutate(a, 7)), (3L, ts(1), doc(30)))
      q.processAllAvailable()
      // D arrives a batch later: state must still hold A's buckets
      in.addData((4L, ts(2), mutate(a, 21)), (5L, ts(2), doc(50)))
      q.processAllAvailable()
      val rows = spark.table("fuzzy_out")
        .select("id", "dupOf", "estJaccard").collect()
      val pairs = rows.map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(pairs === Set(2L -> 1L, 4L -> 1L),
        s"near-dups flag against first-seen rep; got $pairs")
      assert(rows.forall(_.getDouble(2) >= cfg.threshold))
    } finally q.stop()
  }

  test("stream emits the same match set as the batch twin on a monotonic slicing") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val a = doc(100); val b = doc(200)
    val rows = Seq(
      (1L, ts(0), a), (2L, ts(0), b), (3L, ts(1), mutate(a, 3)),
      (4L, ts(2), mutate(b, 11)), (5L, ts(2), doc(300)), (6L, ts(3), mutate(a, 40)))
    val static = rows.toDF("id", "warc_ts", "text")
    val expected = StreamingDedup.fuzzyMatchesBatch(static, cfg)
      .select("id", "dupOf").collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(expected === Set(3L -> 1L, 4L -> 2L, 6L -> 1L))

    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingDedup.fuzzyMatches(in.toDF().toDF("id", "warc_ts", "text"), cfg)
      .writeStream.format("memory").queryName("twin_out").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sd-twin").toString)
      .start()
    try {
      // three event-time-monotonic micro-batches
      in.addData(rows.take(3)); q.processAllAvailable()
      in.addData(rows.slice(3, 5)); q.processAllAvailable()
      in.addData(rows.drop(5)); q.processAllAvailable()
      val streamed = spark.table("twin_out")
        .select("id", "dupOf").collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(streamed === expected)
    } finally q.stop()
  }

  test("estimator: identical docs estimate 1.0; disjoint docs share no bucket") {
    import spark.implicits._
    val a = doc(400)
    val static = Seq((1L, ts(0), a), (2L, ts(1), a), (3L, ts(1), doc(500)))
      .toDF("id", "warc_ts", "text")
    val m = StreamingDedup.fuzzyMatchesBatch(static, cfg).collect()
    assert(m.length === 1)
    assert(m.head.getAs[Long]("id") === 2L)
    assert(m.head.getAs[Double]("estJaccard") === 1.0)
  }

  test("b-bit packing: golden layout, lane matching, estimator calibration") {
    // sig [0b1011, 0b0001] at b=4: lane0 LSB-first bits 1,1,0,1 → low
    // nibble 0xB; lane1 → 0x1 in the high nibble
    assert(StreamingDedup.packLanes(Array(0xB, 0x1), 4).toSeq === Seq(0x1B.toByte))
    // b=32 is the identity layout (little-endian ints)
    assert(StreamingDedup.packLanes(Array(0x01020304), 32).toSeq ===
      Seq[Byte](0x04, 0x03, 0x02, 0x01))
    val a = Array(7, 9, -3, 100, 0)
    val b = Array(7, 8, -3, 116, 0) // lanes 1,3 differ in full ints
    val pa32 = StreamingDedup.packLanes(a, 32)
    val pb32 = StreamingDedup.packLanes(b, 32)
    assert(StreamingDedup.matchingLanes(pa32, pb32, 5, 32) === 3)
    // at b=4, lane 3 (100=0x64 vs 116=0x74) collides on its low nibble
    val pa4 = StreamingDedup.packLanes(a, 4)
    val pb4 = StreamingDedup.packLanes(b, 4)
    assert(pa4.length === 3 && StreamingDedup.matchingLanes(pa4, pb4, 5, 4) === 4)
    // estimator: identical → exactly 1.0 at any b; the b=4 false match
    // is corrected back toward the true 3/5
    assert(StreamingDedup.estimateJ(5, 5, 4) === 1.0)
    assert(StreamingDedup.estimateJ(5, 5, 1) === 1.0)
    val est4 = StreamingDedup.estimateJ(4, 5, 4)
    assert(est4 < 4.0 / 5 && est4 > 3.0 / 5)
    // all-collision floor clamps at 0 (m/n == 2^-b on unrelated sigs)
    assert(StreamingDedup.estimateJ(0, 5, 4) === 0.0)
  }

  test("b-bit state (stateBits=8) flags the same planted near-dups as full lanes") {
    import spark.implicits._
    val a = doc(600); val b = doc(700)
    val rows = Seq(
      (1L, ts(0), a), (2L, ts(0), b), (3L, ts(1), mutate(a, 3)),
      (4L, ts(2), mutate(b, 11)), (5L, ts(2), doc(800)))
    val static = rows.toDF("id", "warc_ts", "text")
    val full = StreamingDedup.fuzzyMatchesBatch(static, cfg)
      .select("id", "dupOf").as[(Long, Long)].collect().toSet
    val bbit = StreamingDedup.fuzzyMatchesBatch(static, cfg, stateBits = 8)
      .select("id", "dupOf").as[(Long, Long)].collect().toSet
    assert(full === Set(3L -> 1L, 4L -> 2L))
    assert(bbit === full, "8-bit lanes must find the same planted pairs")
    // estimates stay calibrated: identical docs still read exactly 1.0
    val ident = StreamingDedup.fuzzyMatchesBatch(
        Seq((1L, ts(0), a), (2L, ts(1), a)).toDF("id", "warc_ts", "text"),
        cfg, stateBits = 4)
      .select("estJaccard").as[Double].head()
    assert(ident === 1.0)
  }

  // ---- semantic stream: deterministic vectors, near-dups by construction
  private def svec(seed: Long, dim: Int = 16): Array[Float] =
    Array.tabulate(dim) { d =>
      val h = Hashes.xxh64Long(seed * 131 + d, 7L)
      (((h >>> 20) & 0xFFFF).toFloat / 65535f) - 0.5f
    }
  private def nudge(v: Array[Float], seed: Long): Array[Float] = {
    val n = svec(90000L + seed)
    Array.tabulate(v.length)(d => v(d) + 0.01f * n(d))
  }

  test("semanticMatches flags exact-cosine near-dups against the first-seen " +
      "home rep, across micro-batches; stream == batch twin") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val a = svec(1); val b = svec(2)
    val rows = Seq(
      (1L, ts(0), a), (2L, ts(0), b), (3L, ts(1), nudge(a, 3)),
      (4L, ts(2), nudge(b, 11)), (5L, ts(2), svec(55)), (6L, ts(3), nudge(a, 40)))
    val static = rows.toDF("id", "ts", "vec")
    val expected = StreamingDedup
      .semanticMatchesBatch(static, 0.95, dim = 16, nbits = 6, probeRadius = 2)
      .select("id", "dupOf").as[(Long, Long)].collect().toSet
    // (6,3) as well: doc 3's nudge shifted one sign bit, so 3 is the
    // first-seen HOME member of its own bucket — 6 probes both buckets
    // and is flagged against both earlier near-dups, by design
    assert(expected === Set(3L -> 1L, 4L -> 2L, 6L -> 1L, 6L -> 3L),
      s"batch twin truth; got $expected")

    val in = MemoryStream[(Long, java.sql.Timestamp, Array[Float])]
    val q = StreamingDedup.semanticMatches(
        in.toDF().toDF("id", "ts", "vec"), 0.95, dim = 16, nbits = 6,
        probeRadius = 2)
      .writeStream.format("memory").queryName("sem_out").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sd-sem").toString)
      .start()
    try {
      in.addData(rows.take(3)); q.processAllAvailable()
      in.addData(rows.slice(3, 5)); q.processAllAvailable()
      in.addData(rows.drop(5)); q.processAllAvailable()
      val streamed = spark.table("sem_out")
        .select("id", "dupOf", "cosine").collect()
      assert(streamed.map(r => r.getLong(0) -> r.getLong(1)).toSet === expected)
      assert(streamed.forall(_.getDouble(2) >= 0.95))
    } finally q.stop()
  }

  test("semantic rep election is home-gated: a radius probe never becomes " +
      "rep, so arrival order decides who is flagged") {
    import spark.implicits._
    val a = svec(7)
    // the LATER near-dup is flagged against the EARLIER doc, never vice versa
    val m1 = StreamingDedup.semanticMatchesBatch(
        Seq((10L, ts(0), a), (20L, ts(1), nudge(a, 1))).toDF("id", "ts", "vec"),
        0.95, dim = 16, nbits = 6, probeRadius = 2)
      .select("id", "dupOf").as[(Long, Long)].collect().toSet
    assert(m1 === Set(20L -> 10L))
    val m2 = StreamingDedup.semanticMatchesBatch(
        Seq((10L, ts(1), a), (20L, ts(0), nudge(a, 1))).toDF("id", "ts", "vec"),
        0.95, dim = 16, nbits = 6, probeRadius = 2)
      .select("id", "dupOf").as[(Long, Long)].collect().toSet
    assert(m2 === Set(10L -> 20L))
    // dissimilar vectors never match even when buckets collide (exact
    // cosine verification, not bucket-equality trust)
    val m3 = StreamingDedup.semanticMatchesBatch(
        Seq((10L, ts(0), a), (30L, ts(1), svec(777))).toDF("id", "ts", "vec"),
        0.95, dim = 16, nbits = 6, probeRadius = 2).count()
    assert(m3 === 0L)
  }
}

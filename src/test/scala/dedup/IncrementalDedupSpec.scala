package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def corpus(ids: Seq[Long], text: Long => String) =
    ids.map(i => (i, text(i))).toDF("id", "text")

  test("exact semantics: equals brute-force anti-join on md5(text)") {
    val existing = corpus(1L to 200L, i => s"doc ${i % 60}") // 60 distinct texts
    val batch = corpus(1000L to 1100L, i => s"doc ${i % 90}") // overlaps 0..59
    val got = IncrementalDedup.newDocs(existing, batch, "id", "text")
      .select("id").as[Long].collect().sorted
    val expect = batch.join(
        existing.select(md5(col("text")).as("h")).distinct(),
        md5(batch("text")) === col("h"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === expect.toSeq)
    assert(got.nonEmpty && got.length < 101) // some new, some dups
  }

  test("no false negatives at any fpp: every truly-new doc survives") {
    val existing = corpus(1L to 500L, i => s"page $i")
    val batch = corpus(2000L to 2050L, i => s"fresh $i")
    // even a terrible fpp cannot drop a new doc (confirm join is exact)
    val got = IncrementalDedup.newDocs(existing, batch, "id", "text", fpp = 0.5)
      .count()
    assert(got === 51L)
  }

  test("null text is always new on both sides") {
    val existing = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val batch = Seq((10L, null.asInstanceOf[String]), (11L, "a"), (12L, "b"))
      .toDF("id", "text")
    val got = IncrementalDedup.newDocs(existing, batch, "id", "text")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === Seq(10L, 12L))
  }

  test("prebuilt bloom roundtrips through save/load and gives same answer") {
    val existing = corpus(1L to 300L, i => s"doc ${i % 40}")
    val batch = corpus(5000L to 5060L, i => s"doc ${i % 80}")
    val bloom = IncrementalDedup.buildBloom(existing, "text")
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    IncrementalDedup.saveBloom(spark, bloom, s"$dir/corpus.bloom")
    val loaded = IncrementalDedup.loadBloom(spark, s"$dir/corpus.bloom")
    val a = IncrementalDedup.newDocs(existing, batch, "id", "text", Some(bloom))
      .select("id").as[Long].collect().sorted
    val b = IncrementalDedup.newDocs(existing, batch, "id", "text", Some(loaded))
      .select("id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  // ----------------------------------------------------------- fuzzy path

  private val fuzzyCfg = DedupConfig(
    ngram = 3, minLength = 5, numPerm = 250, threshold = 0.7,
    seed = 42L, saltBuckets = 4)

  /** Per-class disjoint vocabulary (cross-class trigram jaccard = 0);
    * `mut >= 0` swaps one token, leaving within-class jaccard ≈ 0.85. */
  private def fuzzyText(cls: Int, mut: Int): String = {
    val toks = Array.tabulate(40)(t => s"c${cls}t$t")
    if (mut >= 0) toks(mut % 40) = s"mut$mut"
    toks.mkString(" ")
  }

  /** Brute-force truth: batch ids with some existing doc at exact trigram
    * jaccard ≥ threshold (both sides ≥ minLength tokens). */
  private def bruteNew(existing: Seq[(Long, String)], batch: Seq[(Long, String)]): Seq[Long] = {
    def sh(t: String) = TextNorm.shingleHashes(t, 3, 5)
    val ex = existing.map { case (_, t) => sh(t) }.filter(_.nonEmpty)
    batch.collect { case (id, t)
      if !ex.exists { e =>
        val s = sh(t)
        s.nonEmpty && {
          val (i, u) = VerifyPairs.jaccardCounts(s, e)
          i.toLong * 10 >= u.toLong * 7
        }
      } => id
    }.sorted
  }

  test("newDocsFuzzy equals the brute-force all-pairs exact-Jaccard truth") {
    val existing = (0 until 20).map(c => (c.toLong, fuzzyText(c, -1)))
    val batch =
      (0 until 8).map(c => (100L + c, fuzzyText(c, c))) ++ // near-dups of existing
      Seq((200L, fuzzyText(3, -1))) ++                     // byte-identical copy
      (30 until 40).map(c => (300L + c, fuzzyText(c, -1))) // genuinely new classes
    val got = IncrementalDedup.newDocsFuzzy(
        existing.toDF("id", "text"), batch.toDF("id", "text"), fuzzyCfg)
      .select("id").as[Long].collect().sorted.toSeq
    val expect = bruteNew(existing, batch)
    assert(got === expect)
    assert(got.length === 10) // the 10 new classes only
  }

  test("newDocsFuzzy: prebuilt index gives the identical answer") {
    val existing = (0 until 12).map(c => (c.toLong, fuzzyText(c, -1))).toDF("id", "text")
    val batch = (0 until 18).map(c => (500L + c, fuzzyText(c, c))).toDF("id", "text")
    val idx = IncrementalDedup.buildFuzzyIndex(existing, fuzzyCfg)
    val a = IncrementalDedup.newDocsFuzzy(existing, batch, fuzzyCfg)
      .select("id").as[Long].collect().sorted.toSeq
    val b = IncrementalDedup.newDocsFuzzy(existing, batch, fuzzyCfg, Some(idx))
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b && a.length === 6)
  }

  test("crossPairs equals brute-force pairs with exact (inter, uni)") {
    val existing = (0 until 12).map(c => (c.toLong, fuzzyText(c, -1)))
    val batch = (0 until 6).map(c => (100L + c, fuzzyText(c, c))) ++
      Seq((200L, fuzzyText(3, -1))) ++
      (30 until 34).map(c => (300L + c, fuzzyText(c, -1)))
    val got = IncrementalDedup.crossPairs(
        existing.toDF("id", "text"), batch.toDF("id", "text"), fuzzyCfg)
      .as[(Long, Long, Long, Long)].collect().toSet
    def sh(t: String) = TextNorm.shingleHashes(t, 3, 5)
    val expect = (for {
      (bid, bt) <- batch
      (eid, et) <- existing
      (i, u) = VerifyPairs.jaccardCounts(sh(bt), sh(et))
      if i.toLong * 10 >= u.toLong * 7
    } yield (bid, eid, i.toLong, u.toLong)).toSet
    assert(got === expect)
    assert(got.size === 7) // 6 near-dups + 1 identical copy
  }

  test("pipeline kitchen-sink: every stage flag composes and resumes") {
    val dir = java.nio.file.Files.createTempDirectory("pipesink").toString
    val args = Pipeline.parse(Array(
      "--synth", "800", "--output", s"$dir/out",
      "--simhash", "--suffix", "--semantic", "--sem-k", "10",
      "--infer-lang", "--quality", "--dedup-lines", "--redact-pii",
      "--remove-runs", "--shard-tokens", "5000",
      "--sample-alpha", "0.7", "--sample-target", "0.8",
      "--blocklist", "zzzz", "--block-max-permille", "0",
      "--resolve-recrawls"))
    val (kept1, a1) = Pipeline.run(spark, args)
    val n1 = kept1.count()
    assert(n1 > 0 && n1 < a1.count())
    assert(kept1.columns.contains("shard"))
    val (kept2, _) = Pipeline.run(spark, args) // resume: identical output
    assert(kept2.select("url").as[String].collect().sorted.toSeq ===
      kept1.select("url").as[String].collect().sorted.toSeq)
  }

  test("newDocsFuzzy: saved+loaded index gives the identical answer") {
    val existing = (0 until 10).map(c => (c.toLong, fuzzyText(c, -1))).toDF("id", "text")
    val batch = (0 until 15).map(c => (700L + c, fuzzyText(c, c + 1))).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("fidx").toString
    IncrementalDedup.saveFuzzyIndex(
      IncrementalDedup.buildFuzzyIndex(existing, fuzzyCfg), s"$dir/idx")
    val loaded = IncrementalDedup.loadFuzzyIndex(spark, s"$dir/idx")
    val a = IncrementalDedup.newDocsFuzzy(existing, batch, fuzzyCfg)
      .select("id").as[Long].collect().sorted.toSeq
    val b = IncrementalDedup.newDocsFuzzy(existing, batch, fuzzyCfg, Some(loaded))
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b && a.length === 5)
  }

  test("newDocsFuzzy bucketCap: hot bucket of identical corpus docs still drops the dup") {
    // 50 byte-identical existing docs share EVERY band bucket (hot key);
    // cap 2 keeps only the 2 min-id per bucket yet the batch copy is still
    // verified against those and dropped — graceful recall under the cap
    val existing = ((0 until 50).map(i => (i.toLong, fuzzyText(1, -1))) ++
      Seq((60L, fuzzyText(2, -1)))).toDF("id", "text")
    val batch = Seq((100L, fuzzyText(1, 7)), (101L, fuzzyText(9, -1))).toDF("id", "text")
    val capped = IncrementalDedup.newDocsFuzzy(existing, batch, fuzzyCfg, bucketCap = 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(capped === Seq(101L))
    val exact = IncrementalDedup.newDocsFuzzy(existing, batch, fuzzyCfg)
      .select("id").as[Long].collect().sorted.toSeq
    assert(exact === capped)
  }

  test("newDocsFuzzy: sub-minLength batch docs are always new; re-crawled id does not conflate") {
    val existing = Seq((5L, fuzzyText(5, -1)), (6L, fuzzyText(6, -1))).toDF("id", "text")
    val batch = Seq(
      (5L, fuzzyText(5, 3)),   // same id as existing, near-dup text -> dropped
      (7L, "too few tokens"),  // below minLength -> no shingles -> kept
      (8L, fuzzyText(40, -1))) // new class -> kept
      .toDF("id", "text")
    val got = IncrementalDedup.newDocsFuzzy(existing, batch, fuzzyCfg)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === Seq(7L, 8L))
  }

  test("pipeline --existing-fuzzy --remove-runs --shard-tokens composition") {
    import org.apache.spark.sql.functions.xxhash64
    val dir = java.nio.file.Files.createTempDirectory("pipeflags").toString
    // existing corpus: 8 classes; batch: near-dups of classes 0-2 (url-distinct,
    // so exact incremental keeps them; fuzzy must drop them) + new classes
    val ts = new java.sql.Timestamp(0L)
    val existing = (0 until 8).map(c =>
      Page(s"https://e/$c", ts, null, fuzzyText(c, -1), "en")).toDF()
    existing.write.mode("overwrite").parquet(s"$dir/existing")
    val batch = ((0 until 3).map(c =>
        Page(s"https://b/$c", ts, null, fuzzyText(c, c), "en")) ++
      (20 until 26).map(c =>
        Page(s"https://b/$c", ts, null, fuzzyText(c, -1), "en"))).toDF()
    batch.write.mode("overwrite").parquet(s"$dir/batch")
    val args = Pipeline.parse(Array(
      "--input", s"$dir/batch", "--output", s"$dir/out",
      "--existing", s"$dir/existing", "--existing-fuzzy",
      "--ngram", "3", "--remove-runs", "--shard-tokens", "60"))
    val (kept, _) = Pipeline.run(spark, args)
    val rows = kept.select(col("url"), col("shard")).as[(String, Long)]
      .collect().sortBy(_._1)
    // the 3 near-dups of existing classes are gone; 6 new classes survive
    assert(rows.map(_._1).toSeq === (20 until 26).map(c => s"https://b/$c"))
    // shard packing: 40-token docs at budget 60 → shards advance every ~2 docs
    val shardsById = kept
      .select(xxhash64(col("url")).as("id"), col("shard")).as[(Long, Long)]
      .collect().sortBy(_._1).map(_._2)
    assert(shardsById.toSeq === shardsById.sorted.toSeq)
    // 40-token docs, budget 60: prefixes 0,40,..,200 → shards 0,0,1,2,2,3
    assert(shardsById.toSeq === Seq(0L, 0L, 1L, 2L, 2L, 3L))
    assert(kept.columns.contains("shard"))
  }

  test("newDocsSemantic: near-dup embeddings dropped, orthogonal kept, payload intact") {
    val rnd = new scala.util.Random(5)
    val dim = 32
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val corpus = (0 until 40).map { i =>
      (i.toLong, unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    }
    val corpusDf = corpus.toDF("id", "vec")
    // batch: ids 1000+i — every 3rd a tiny perturbation of corpus vector i
    // (cosine ~0.999), the rest fresh random (cosine << 0.95 w.h.p.)
    val batch = (0 until 40).map { i =>
      val vec =
        if (i % 3 == 0) unit(corpus(i)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
        else unit(Array.fill(dim)(rnd.nextGaussian().toFloat))
      (1000L + i, vec, s"payload$i")
    }
    val batchDf = batch.toDF("id", "vec", "meta")
    val kept = IncrementalDedup.newDocsSemantic(
      corpusDf, batchDf, 0.95, dim, nbits = 8, probeRadius = 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // exact-verify precision: no fresh vector can be dropped spuriously —
    // verify brute-force truth and compare exactly
    val truthDropped = batch.filter { case (_, bv, _) =>
      corpus.exists { case (_, cv) =>
        bv.zip(cv).map { case (a, b) => a.toDouble * b }.sum >= 0.95
      }
    }.map(_._1).toSet
    assert(truthDropped.nonEmpty, "test must plant real near-dups")
    assert(kept.keySet === batch.map(_._1).toSet -- truthDropped,
      "kept set must equal brute-force truth (recall at this regime + exact precision)")
    assert(kept.values.forall(_.startsWith("payload")), "payload columns survive")
  }

  test("newDocsSemantic: zero vectors are never each other's 'exact duplicates'") {
    // cosine(0, ·) is undefined (Ann.cosine -> null), and the OOV/no-signal
    // embedding of a weights encoder is all zeros — a corpus containing one
    // zero vector must not delete every zero-vector batch doc as a "dup".
    val dim = 8
    val zero = Array.fill(dim)(0f)
    val corpusDf = Seq(
      (1L, Array.fill(dim)(0.5f)),
      (2L, zero.clone())).toDF("id", "vec")
    val batchDf = Seq(
      (10L, zero.clone()),              // zero: must stay new
      (11L, Array.fill(dim)(0.5f))).toDF("id", "vec") // exact non-zero dup: drops
    val kept = IncrementalDedup.newDocsSemantic(corpusDf, batchDf, 0.9, dim)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(10L),
      "zero batch vec kept (similar to nothing), non-zero exact dup dropped")
  }

  test("newDocsSemantic: exact duplicates of bucket-EVICTED corpus vectors " +
      "are still dropped (cap-immune prefilter)") {
    // the corpus index is asymmetric: a corpus vector evicted by bucketCap
    // is unreachable from the batch side via LSH entirely (ADVICE r3).
    // nbits=2 → 4 buckets, cap=1 → ≥46 of 50 corpus vectors evicted;
    // probeRadius=0 keeps the LSH path maximally blind. Every batch doc is
    // a byte-identical copy of some corpus vector, so ALL must drop — the
    // vector-equality prefilter, not the LSH join, has to catch them.
    val rnd = new scala.util.Random(7)
    val dim = 16
    val corpus = (0 until 50).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
    val kept = IncrementalDedup.newDocsSemantic(
      corpus.toDF("id", "vec"),
      corpus.map { case (i, v) => (1000L + i, v.clone()) }.toDF("id", "vec"),
      0.95, dim, nbits = 2, probeRadius = 0, bucketCap = 1)
    assert(kept.count() === 0L,
      "every batch doc is an exact copy; eviction must not leak any through")
  }

  test("bloom prefilter is load-bearing: rejects most new keys before any join") {
    val existing = corpus(1L to 1000L, i => s"page $i")
    val bloom = IncrementalDedup.buildBloom(existing, "text", fpp = 0.01)
    val newKeys = (1 to 1000).map(i => s"fresh $i")
    val fp = newKeys.count { k =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
      bloom.mightContainString(h)
    }
    assert(fp < 50, s"false-positive count $fp should be ~1% of 1000")
    // and zero false negatives by construction
    val present = (1 to 1000).forall { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"page $i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      bloom.mightContainString(h)
    }
    assert(present)
  }
}

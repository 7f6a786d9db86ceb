package dedup

import org.scalatest.funsuite.AnyFunSuite

/** E2E gates on the deterministic synthetic corpus (FIXTURES.md §2):
  * dup-pair recall vs a brute-force exact-Jaccard oracle, precision of
  * verified pairs, hot-key cluster handling, partition-layout invariance.
  */
class EndToEndSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private val N = 1200L
  private val cfg = DedupConfig(
    idCol = "id", textCol = "text",
    ngram = 5, minLength = 5, numPerm = 250, threshold = 0.7,
    seed = 42L, saltBuckets = 8, verify = true)

  private lazy val corpus = {
    import spark.implicits._
    Synth.corpus(spark, N).map(d => (Hashes.xxh64Str(d.url), d.text, d.cluster, d.cls))
      .toDF("id", "text", "cluster", "cls")
      .cache()
  }

  /** brute-force truth: pairs with exact shingle-Jaccard >= threshold */
  private lazy val truthPairs: Set[(Long, Long)] = {
    val docs = corpus.select("id", "text").collect()
      .map(r => r.getLong(0) -> TextNorm.shingleHashes(r.getString(1), cfg.ngram, cfg.minLength))
      .filter(_._2.nonEmpty)
    val out = scala.collection.mutable.Set[(Long, Long)]()
    var i = 0
    while (i < docs.length) {
      var j = i + 1
      while (j < docs.length) {
        val (inter, uni) = VerifyPairs.jaccardCounts(docs(i)._2, docs(j)._2)
        if (inter.toLong * 10 >= uni.toLong * 7) {
          val (a, b) = (docs(i)._1, docs(j)._1)
          out += ((math.max(a, b), math.min(a, b)))
        }
        j += 1
      }
      i += 1
    }
    out.toSet
  }

  private lazy val result = FuzzyDedup.run(corpus, cfg)
  private lazy val assignMap: Map[Long, Long] =
    result.assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("reference-parity: verified pipeline recovers >=0.99 of the pairs the " +
      "reference semantics (no verification) would find") {
    // reference flagship accepts all LSH bucket-mates (fuzzy_spark2.py:620-623);
    // our verify gate must not lose true dup pairs relative to that
    val refAssign = FuzzyDedup.run(corpus, cfg.copy(verify = false)).assignments
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refFound = truthPairs.filter { case (a, b) => refAssign(a) == refAssign(b) }
    assert(refFound.nonEmpty)
    val ours = refFound.count { case (a, b) => assignMap(a) == assignMap(b) }
    val recall = ours.toDouble / refFound.size
    info(s"reference-mode finds ${refFound.size} true pairs; ours keeps $ours (recall $recall)")
    assert(recall >= 0.99, s"recall vs reference semantics $recall below gate")
  }

  test("dup-pair recall >= 0.99 vs brute-force exact-Jaccard oracle") {
    assert(truthPairs.nonEmpty, "synth corpus must plant dup pairs")
    // found pair = same component in the final assignment
    val found = truthPairs.count { case (a, b) => assignMap(a) == assignMap(b) }
    val recall = found.toDouble / truthPairs.size
    info(s"truth pairs: ${truthPairs.size}, found: $found, recall: $recall")
    assert(recall >= 0.99, s"recall $recall below gate")
  }

  test("incremental fuzzy recall >= 0.99 on the synth corpus split in two") {
    // split the corpus into "existing" (even ids) and "batch" (odd ids):
    // the planted dup classes cross the split, so the truth is the
    // cross-split slice of the brute-force pair set; newDocsFuzzy must
    // drop >=0.99 of the batch docs that have an existing near-dup, and
    // crossPairs must be exactly the verified subset of that truth.
    val existing = corpus.where(org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(2L)) === 0L)
    val batch = corpus.where(org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(2L)) === 1L)
    val crossTruth = truthPairs.filter { case (a, b) =>
      (Math.floorMod(a, 2L) == 0L) != (Math.floorMod(b, 2L) == 0L)
    }
    assert(crossTruth.nonEmpty, "split must cut through planted dup classes")
    val dupBatchTruth = crossTruth.map { case (a, b) =>
      if (Math.floorMod(a, 2L) == 1L) a else b
    }
    val keptIds = IncrementalDedup.newDocsFuzzy(existing, batch, cfg)
      .select("id").collect().map(_.getLong(0)).toSet
    val dropped = dupBatchTruth.count(!keptIds.contains(_))
    val recall = dropped.toDouble / dupBatchTruth.size
    info(s"cross-split dup batch docs: ${dupBatchTruth.size}, dropped: $dropped, recall: $recall")
    assert(recall >= 0.99, s"incremental fuzzy recall $recall below gate")
    // precision: every crossPairs row is a true >= threshold pair
    val pairs = IncrementalDedup.crossPairs(existing, batch, cfg)
      .select("bid", "eid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bad = pairs.filterNot { case (b, e) =>
      crossTruth.contains((math.max(b, e), math.min(b, e)))
    }
    assert(bad.isEmpty, s"${bad.size} false-positive cross pairs: ${bad.take(3)}")
  }

  test("verified pairs are all true positives (precision of the verify gate)") {
    import spark.implicits._
    val verified = result.edges.select("src", "dst").as[(Long, Long)].collect()
    val shingleMap = corpus.select("id", "text").collect()
      .map(r => r.getLong(0) -> TextNorm.shingleHashes(r.getString(1), cfg.ngram, cfg.minLength))
      .toMap
    verified.foreach { case (s, d) =>
      val (inter, uni) = VerifyPairs.jaccardCounts(shingleMap(s), shingleMap(d))
      assert(inter.toLong * 10 >= uni.toLong * 7, s"verified pair ($s,$d) below threshold: $inter/$uni")
    }
  }

  test("hot-key template cluster resolves into one component (salting path)") {
    val hotIds = corpus.where(org.apache.spark.sql.functions.col("cls") === "hot")
      .select("id").collect().map(_.getLong(0))
    assert(hotIds.length > 5, "synth should plant a hot cluster")
    val comps = hotIds.map(assignMap).distinct
    assert(comps.length === 1, s"hot cluster split into ${comps.length} components")
  }

  test("exact-dup classes dedupe to one representative per cluster") {
    import org.apache.spark.sql.functions._
    val exact = corpus.where(col("cls") === "exact")
    val withComp = exact.join(
      result.assignments.withColumnRenamed("id", "id2"),
      exact("id") === col("id2"))
    // docs in the same planted cluster share a component
    val bad = withComp.groupBy(col("cluster"))
      .agg(countDistinct(col("component")).as("nc"))
      .where(col("nc") > 1).count()
    assert(bad === 0L)
  }

  test("assignments are partition-layout invariant (ids are content-keyed)") {
    val re = corpus.repartition(17)
    val again = FuzzyDedup.run(re, cfg).assignments
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === assignMap)
  }

  test("kept = one doc per component; removal anti-join consistent") {
    val kept = FuzzyDedup.kept(corpus, cfg)
    val keptIds = kept.select("id").collect().map(_.getLong(0)).toSet
    val byComp = assignMap.groupBy(_._2)
    assert(keptIds.size === byComp.size)
    byComp.foreach { case (comp, members) =>
      assert(keptIds.contains(comp) || !members.keySet.contains(comp))
      assert(members.keySet.intersect(keptIds).size === 1)
    }
  }

  test("short docs are excluded from matching but preserved in assignments") {
    val shortIds = corpus.where(org.apache.spark.sql.functions.col("cls") === "short")
      .select("id").collect().map(_.getLong(0))
    shortIds.foreach { id =>
      assert(assignMap(id) === id, "short docs can never match (below min_length)")
    }
  }

  test("per-language recall report: every language split >= 0.99 recall " +
      "(reference Indic-benchmark counterpart)") {
    // reference reports recall per language over language-split pipelines
    // (Indic Languages Benchmark/Readme.md:9-58, master_lang_split.py);
    // ours: per-lang verified fuzzy dedup vs per-lang brute-force
    // exact-Jaccard truth on the multi-lang synthetic page table
    val stats = RecallReport.perLangRecall(spark, 1600L, cfg)
    info("\n" + RecallReport.markdown(stats, cfg, 1600L))
    assert(stats.size >= 10,
      "corpus must span >=10 languages/scripts (multiScriptPages plants 23)")
    assert(stats.map(_.truthPairs).sum > 100, "truth must be non-vacuous")
    // gate = recall vs the reference at identical config (north rule);
    // raw brute-force-truth recall is reported but only gated in
    // aggregate — a pair at similarity exactly t is banded with prob
    // ~0.77 at (25,10), so tiny per-lang splits flip coins on it
    val agg = stats.map(_.foundPairs).sum.toDouble / stats.map(_.truthPairs).sum
    assert(agg >= 0.98, s"aggregate brute-force-truth recall $agg below 0.98")
    stats.foreach { s =>
      assert(s.truthPairs > 0, s"vacuous split ${s.lang}")
      assert(s.refPairs > 0, s"vacuous reference split ${s.lang}")
      assert(s.refRecall >= 0.99, s"lang ${s.lang} recall-vs-reference ${s.refRecall} below gate")
      assert(s.verifiedPrecision == 1.0, s"lang ${s.lang} emitted a false verified pair")
    }
  }

  test("all pipeline stages compose (--extract-html --quality --infer-lang " +
      "--simhash --suffix --semantic) and the composed run resumes identically") {
    val root = java.nio.file.Files.createTempDirectory("compose").toString
    val args = Pipeline.Args(
      synth = 600, output = root,
      simhash = true, suffix = true,
      semantic = true, semK = 8, semDim = 16,
      inferLang = true, quality = true, extractHtml = true,
      cfg = DedupConfig(numPerm = 64, saltBuckets = 4))
    val (kept1, a1) = Pipeline.run(spark, args)
    val k1 = kept1.count(); val n1 = a1.count()
    assert(n1 > 0L && k1 > 0L && k1 <= n1,
      s"composed pipeline produced kept=$k1 of assigned=$n1")
    // full rerun: every stage resumes from its checkpoint (config hash
    // encodes the whole flag set), results byte-identical
    val (kept2, a2) = Pipeline.run(spark, args)
    assert(kept2.count() === k1)
    assert(a2.count() === n1)
    assert(a2.exceptAll(a1).count() === 0L, "rerun changed assignments")
  }

  test("--extract-html --main-content --nfc --link-rank: source prep composes " +
      "(boilerplate dropped, NFC merges composed/decomposed dups, ranks written)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prep").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val prose = "This page carries one long paragraph of body prose that " +
      "clears the length gate comfortably and has no links at all."
    val html = ("<html><body><p>" + prose + "</p>" +
      "<nav><a href=\"https://hub.example.net/x\">Hub</a> " +
      "<a href=\"https://hub.example.net/y\">More</a></nav></body></html>")
      .getBytes("UTF-8")
    // p2 decomposed (e + U+0301), p3 composed (U+00E9): byte-different,
    // NFC-identical — must dedup to ONE kept doc under --nfc
    val deco = "re\u0301sume\u0301 writing advice body with plenty of words here"
    val comp = "r\u00E9sum\u00E9 writing advice body with plenty of words here"
    Seq(
      Page("http://a.example/1", ts, html, null, "en"),
      Page("http://b.example/2", ts, null, deco, "en"),
      Page("http://c.example/3", ts, null, comp, "en"))
      .toDS().toDF().write.mode("overwrite").parquet(s"$dir/in.parquet")
    val args = Pipeline.parse(Array(
      "--input", s"$dir/in.parquet", "--output", s"$dir/out",
      "--extract-html", "--main-content", "--nfc", "--link-rank", "2",
      "--num-perm", "64", "--salt", "4"))
    val (kept, assigns) = Pipeline.run(spark, args)
    val texts = kept.select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(assigns.count() === 3L)
    // main content: paragraph kept, nav dropped
    assert(texts("http://a.example/1") === prose)
    // NFC: exactly one of the composed/decomposed twins survives, composed
    assert(kept.count() === 2L)
    val twin = texts.find(_._1 != "http://a.example/1").get
    assert(twin._2 === comp)
    // link-rank artifact: 2 hosts (a.example -> hub.example.net)
    val ranks = spark.read.parquet(s"$dir/out/host_ranks")
    assert(ranks.count() === 2L)
    assert(ranks.columns.toSeq === Seq("host", "rank"))
    // --main-content without --extract-html would be a silent no-op; parse
    // must reject it loudly instead
    val err = intercept[IllegalArgumentException] {
      Pipeline.parse(Array("--synth", "10", "--output", dir, "--main-content"))
    }
    assert(err.getMessage.contains("--extract-html"))
  }

  test("--contain: quote-inside-page dropped by the containment stage, " +
      "invisible to MinHash; exact dups collapse upstream; resume identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def page(url: String, text: String) = Page(url, ts, null, text, "en")
    val quote = (0 until 30).map(k => s"quote$k").mkString(" ")
    val filler = (0 until 300).map(k => s"page$k").mkString(" ")
    val other = (0 until 80).map(k => s"other$k").mkString(" ")
    Seq(
      page("http://wire/story", quote), // verbatim inside the big page
      page("http://big/page", s"$quote $filler"),
      page("http://big/page-copy", s"$quote $filler"), // exact dup of the page
      page("http://un/related", other),
      // below min_length (5 tokens): absent from the shingle stage, so it
      // is OUTSIDE the containment universe — a phantom "contained" drop
      // of short docs was a real round-4 bug
      page("http://tiny/doc", "hi there"))
      .toDS().toDF().write.mode("overwrite").parquet(s"$dir/in.parquet")
    val argv = Array(
      "--input", s"$dir/in.parquet", "--output", s"$dir/out",
      "--contain", "0.9", "--num-perm", "64", "--salt", "4")
    val (kept, assigns) = Pipeline.run(spark, Pipeline.parse(argv))
    val keptUrls = kept.select("url").as[String].collect().toSet
    assert(assigns.count() === 5L)
    assert(keptUrls.contains("http://tiny/doc"),
      "short doc (no shingles) must never be containment-dropped")
    // MinHash cannot see the quote (jaccard ≈ 0.09 << 0.7) — only the
    // containment stage drops it; the byte-identical page copy falls to
    // the main dedup; exactly one big page + the unrelated doc survive
    assert(!keptUrls.contains("http://wire/story"), "quote must be contained-dropped")
    assert(keptUrls.contains("http://un/related"))
    assert(keptUrls.count(_.startsWith("http://big/")) === 1)
    // the stage checkpointed and the rerun resumes to identical output
    assert(new java.io.File(s"$dir/out/contain_drops/_MANIFEST.json").exists())
    // run-summary artifact: first run computed everything
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val sum1 = om.readTree(new java.io.File(s"$dir/out/SUMMARY.json"))
    val stages1 = sum1.get("stages").elements()
    var sawKept = false
    while (stages1.hasNext) {
      val s = stages1.next()
      assert(!s.get("resumed").asBoolean(), s"first run must compute ${s.get("stage")}")
      if (s.get("stage").asText() == "kept") {
        sawKept = true
        assert(s.get("rows").asLong() === keptUrls.size.toLong)
      }
    }
    assert(sawKept, "SUMMARY.json must include the kept stage")
    val (kept2, _) = Pipeline.run(spark, Pipeline.parse(argv))
    assert(kept2.select("url").as[String].collect().toSet === keptUrls)
    // rerun summary: every stage resumed (the resume audit in one file)
    val sum2 = om.readTree(new java.io.File(s"$dir/out/SUMMARY.json"))
    val stages2 = sum2.get("stages").elements()
    while (stages2.hasNext) {
      val s = stages2.next()
      assert(s.get("resumed").asBoolean(), s"rerun must resume ${s.get("stage")}")
    }
    // without --contain the quote survives (proves the stage does the work)
    val (keptNo, _) = Pipeline.run(spark, Pipeline.parse(
      Array("--input", s"$dir/in.parquet", "--output", s"$dir/out_nc",
        "--num-perm", "64", "--salt", "4")))
    assert(keptNo.select("url").as[String].collect().toSet
      .contains("http://wire/story"))
  }

  test("--nb-quality: model generalizes the heuristic teacher — spam-vocab " +
      "doc that PASSES the Gopher gate is dropped; exclusive with --quality") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nbq").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def page(url: String, text: String) = Page(url, ts, null, text, "en")
    def shuffled(tokens: Seq[String], salt: Long): String =
      tokens.sortBy(t => Hashes.xxh64Str(s"$t|$salt")).mkString(" ")
    val spamVocab = (0 until 40).map(k => s"zzspam$k")
    val goodVocab = (0 until 80).map(k => s"goodword$k")
    // teacher-negative: 40-token spam docs (fail ok_len < 50); the NB
    // learns the zzspam vocabulary is negative evidence
    val spamDocs = (0 until 30).map(i =>
      page(s"http://spam/$i", shuffled(spamVocab, i)))
    // teacher-positive: 60-token good docs
    val goodDocs = (0 until 30).map(i =>
      page(s"http://good/$i", shuffled(goodVocab.take(50) ++
        goodVocab.drop(50).take(10).map(t => s"$t$i"), 100L + i)))
    // the probe: 60 tokens of PURE spam vocabulary — passes every Gopher
    // rule (len, distinct, alpha, word len), so the heuristic keeps it;
    // only the learned filter can drop it
    val probe = page("http://spamlike/pass",
      shuffled(spamVocab ++ spamVocab.take(20).map(t => s"${t}x"), 999L))
    (spamDocs ++ goodDocs :+ probe).toDS().toDF()
      .write.mode("overwrite").parquet(s"$dir/in.parquet")

    // sanity: the probe passes the heuristic gate
    val probeKeep = TextAnalysis.qualityFilter(
        Seq(("p", probe.text)).toDF("id", "text"), "text")
      .select("keep").as[Boolean].head()
    assert(probeKeep, "probe must pass the Gopher gate for the test to bite")

    val (kept, _) = Pipeline.run(spark, Pipeline.parse(Array(
      "--input", s"$dir/in.parquet", "--output", s"$dir/out",
      "--nb-quality", "--num-perm", "64", "--salt", "4")))
    val keptUrls = kept.select("url").as[String].collect().toSet
    assert(keptUrls.count(_.startsWith("http://good/")) === 30,
      "all good docs survive the model gate")
    assert(!keptUrls.exists(_.startsWith("http://spam/")),
      "teacher-negative docs are dropped")
    assert(!keptUrls.contains("http://spamlike/pass"),
      "the heuristic-passing spam-vocab probe must be dropped by the MODEL")

    // without any quality flag the probe survives (proves the stage acts)
    val (keptNo, _) = Pipeline.run(spark, Pipeline.parse(Array(
      "--input", s"$dir/in.parquet", "--output", s"$dir/out_no",
      "--num-perm", "64", "--salt", "4")))
    assert(keptNo.select("url").as[String].collect().toSet
      .contains("http://spamlike/pass"))

    // --quality and --nb-quality are mutually exclusive
    intercept[IllegalArgumentException] {
      Pipeline.parse(Array("--input", "x", "--output", "y",
        "--quality", "--nb-quality"))
    }
  }

  test("--decontaminate: benchmark-overlap pages dropped pre-dedup; " +
      "fractional gate spares the partial quote") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("decon").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def page(url: String, text: String) = Page(url, ts, null, text, "en")
    val benchText = (0 until 40).map(k => s"bench$k").mkString(" ")
    Seq(("b1", benchText)).toDF("name", "text")
      .write.mode("overwrite").parquet(s"$dir/bench.parquet")
    val own = (0 until 120).map(k => s"own$k").mkString(" ")
    Seq(
      page("http://copy/of-bench", benchText),               // wholesale copy
      page("http://quote/partial", s"$own $benchText"),      // ~25% quote
      page("http://clean/page", (0 until 60).map(k => s"c$k").mkString(" ")))
      .toDS().toDF().write.mode("overwrite").parquet(s"$dir/in.parquet")
    // strict any-hit gate (GPT-3 appx C): both overlapping pages die
    val (strict, _) = Pipeline.run(spark, Pipeline.parse(Array(
      "--input", s"$dir/in.parquet", "--output", s"$dir/out_strict",
      "--decontaminate", s"$dir/bench.parquet", "--decon-n", "5",
      "--num-perm", "64", "--salt", "4")))
    assert(strict.select("url").as[String].collect().toSet ===
      Set("http://clean/page"))
    // fractional gate at 50%: the partial quote (~25% of grams) survives,
    // the wholesale copy still dies
    val (frac, _) = Pipeline.run(spark, Pipeline.parse(Array(
      "--input", s"$dir/in.parquet", "--output", s"$dir/out_frac",
      "--decontaminate", s"$dir/bench.parquet", "--decon-n", "5",
      "--decon-max-pct", "50", "--num-perm", "64", "--salt", "4")))
    assert(frac.select("url").as[String].collect().toSet ===
      Set("http://clean/page", "http://quote/partial"))
    intercept[IllegalArgumentException] {
      Pipeline.parse(Array("--input", "x", "--output", "y",
        "--decontaminate", "b", "--decon-max-pct", "101"))
    }
  }

  test("--existing / --dedup-lines / --redact-pii: incremental prefilter, " +
      "line dedup and PII scrub compose through the pipeline") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("incr").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def page(url: String, text: String) = Page(url, ts, null, text, "en")
    // existing corpus: one doc whose text a batch doc repeats verbatim
    Seq(page("http://old/1", "already ingested body of text"))
      .toDS().toDF().write.mode("overwrite").parquet(s"$dir/existing.parquet")
    val batch = Seq(
      page("http://new/1", "intro one\nshared banner line\nwrite bob@example.com"),
      page("http://new/2", "intro two\nshared banner line\ncall +1 5550123456"),
      page("http://new/3", "already ingested body of text")) // incremental dup
    batch.toDS().toDF().write.mode("overwrite").parquet(s"$dir/batch.parquet")
    val args = Pipeline.parse(Array(
      "--input", s"$dir/batch.parquet", "--output", s"$dir/out",
      "--existing", s"$dir/existing.parquet",
      "--dedup-lines", "--redact-pii", "--num-perm", "64", "--salt", "4"))
    val (kept, assigns) = Pipeline.run(spark, args)
    val texts = kept.select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // incremental: the byte-identical batch doc never entered the pipeline
    assert(assigns.count() === 2L)
    assert(!texts.contains("http://new/3"))
    // line dedup: exactly one kept doc still carries the shared banner
    assert(texts.values.count(_.contains("shared banner line")) === 1)
    // PII: the kept sink holds tokens, never the raw email/phone
    val joined = texts.values.mkString("\n")
    assert(!joined.contains("bob@example.com") && !joined.contains("5550123456"))
    assert(joined.contains(Pii.EmailToken) && joined.contains(Pii.PhoneToken))
  }

  test("kitchen sink: every post-dedup shaping stage composes in one run and " +
      "resumes byte-identically (--simhash --suffix --dedup-lines --redact-pii " +
      "--sample-target --mix --shard-tokens --cdc-report)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    val argv = Array("--synth", "500", "--output", dir,
      "--simhash", "--suffix", "--dedup-lines", "--redact-pii",
      "--sample-alpha", "0.7", "--sample-target", "0.8",
      "--mix", "*:1", "--mix-budget", "40000",
      "--shard-tokens", "5000",
      "--cdc-report", "6",
      "--num-perm", "64", "--salt", "4")
    val args = Pipeline.parse(argv)
    val (kept, assigns) = Pipeline.run(spark, args)
    val n = kept.count()
    assert(n > 0 && n < 500, s"kept $n of 500")
    assert(assigns.count() > 0)
    // every shaping stage left its mark: shard column assigned, cdc
    // report written with one row per kept doc, mix respected its budget
    // within sampling noise
    assert(kept.schema.fieldNames.contains("shard"))
    val report = spark.read.parquet(s"$dir/cdc_report")
    assert(report.count() === n)
    val toks = kept.withColumn("ntok", size(split(col("text"), "\\s+")))
      .agg(sum(col("ntok"))).collect()(0).getLong(0)
    assert(toks < 40000 * 2 && toks > 40000 / 4, s"mix budget wildly off: $toks")
    // resume: identical kept set, no stage recomputed into a different row set
    val (kept2, _) = Pipeline.run(spark, Pipeline.parse(argv))
    assert(kept2.select("url").collect().map(_.getString(0)).sorted.toSeq ===
      kept.select("url").collect().map(_.getString(0)).sorted.toSeq)
  }
}

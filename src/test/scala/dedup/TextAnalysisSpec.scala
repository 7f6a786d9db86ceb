package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def filterRow(text: String): (Long, Map[String, Boolean]) = {
    import spark.implicits._
    val out = TextAnalysis.qualityFilter(Seq((1L, text)).toDF("id", "text"), "text")
      .collect().head
    val rules = Seq("ok_len", "ok_word_len", "ok_alpha", "ok_digits",
      "ok_repetition", "keep")
    (out.getAs[Long]("n_tokens"),
      rules.map(r => r -> out.getAs[Boolean](r)).toMap)
  }

  test("qualityFilter: a normal mid-length doc passes every rule") {
    val text = ('a' to 'z').flatMap(c => Seq(s"${c}at", s"${c}og", s"${c}un"))
      .take(60).mkString(" ")
    val (n, r) = filterRow(text)
    assert(n === 60)
    assert(r.values.forall(identity), s"expected all-pass, got $r")
  }

  test("qualityFilter: each rule fails on its own pathology") {
    // too short
    assert(!filterRow("only three words")._2("ok_len"))
    // mean word length > 10 (50 long tokens keeps ok_len true)
    val longWords = (1 to 50).map(_ => "a" * 20).mkString(" ")
    assert(!filterRow(longWords)._2("ok_word_len"))
    assert(!filterRow(longWords)._2("keep"))
    // digit soup: >20% digit chars
    val digits = (1 to 60).map(_ => "12345").mkString(" ")
    assert(!filterRow(digits)._2("ok_digits"))
    // non-alpha tokens: <80% of tokens contain a letter
    val punct = ((1 to 30).map(_ => "$$$") ++ (1 to 30).map(i => s"w$i")).mkString(" ")
    assert(!filterRow(punct)._2("ok_alpha"))
    // repetition: one token repeated 60 times -> distinct ratio 1/60
    val rep = (1 to 60).map(_ => "spam").mkString(" ")
    assert(!filterRow(rep)._2("ok_repetition"))
  }

  test("qualityFilter: empty/null text fails closed, never throws") {
    import spark.implicits._
    val out = TextAnalysis.qualityFilter(
      Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
        .toDF("id", "text"), "text")
      .select(col("id"), col("keep")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) false else r.getBoolean(1))).toMap
    assert(out.values.forall(_ == false))
  }

  test("qualityFilter in Pipeline (--quality): drops low-quality pages before dedup") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("qf").toString
    // synthetic pages pass the gate (~200 alpha tokens); planted junk fails
    val pages = Synth.pages(spark, 200).toDF()
    val junk = Seq(
      ("http://junk/1", new java.sql.Timestamp(0L), Array.emptyByteArray,
        "tiny doc", "en"),
      ("http://junk/2", new java.sql.Timestamp(0L), Array.emptyByteArray,
        (1 to 90).map(_ => "99999").mkString(" "), "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
    val all = pages.unionByName(junk)
    val gated = TextAnalysis.qualityFilter(all, "text").where(col("keep"))
    val urls = gated.select("url").as[String].collect().toSet
    assert(!urls.contains("http://junk/1") && !urls.contains("http://junk/2"))
    assert(urls.size >= 190, s"gate too aggressive: kept ${urls.size} of 200 synth pages")
  }

  test("blocklistFilter: occurrence counts (not distinct), exact threshold, zero shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "bad bad bad ok ok ok ok ok ok ok"),   // 3/10 = 300‰
      (2L, "bad ok ok ok ok ok ok ok ok ok"),     // 1/10 = 100‰ (boundary)
      (3L, "ok ok ok ok ok"),                     // 0
      (4L, "worse bad ok ok ok ok ok ok ok ok")   // 2/10 = 200‰
    ).toDF("id", "text")
    val got = TextAnalysis.blocklistFilter(docs, "text", Seq("bad", "worse"), 100)
      .select(col("id"), col("n_tokens"), col("n_blocked"), col("keep"))
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 10L, 3L, false),
      (2L, 10L, 1L, true),  // exactly at the 100-permille boundary keeps
      (3L, 5L, 0L, true),
      (4L, 10L, 2L, false)))
    val plan = TextAnalysis.blocklistFilter(docs, "text", Seq("bad"), 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"blocklist gate must not shuffle:\n$plan")
  }

  test("rareTokenStats: vocabulary threshold, vocabK cap, empty/null text") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // "common" x6, "mid" x3, "one" x1 -> with minCount 3: vocab {common, mid}
    val docs = Seq(
      (1L, "common common mid one"),
      (2L, "common common mid"),
      (3L, "common common mid"),
      (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val got = TextAnalysis.rareTokenStats(docs, "id", "text", 3L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 4L, 1L), (2L, 3L, 0L), (3L, 3L, 0L),
      (4L, 0L, 0L), (5L, 0L, 0L)))
    // vocabK = 1 keeps only the most frequent token; "mid" becomes rare
    val capped = TextAnalysis.rareTokenStats(docs, "id", "text", 3L, vocabK = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(capped.toSeq === Seq((1L, 4L, 2L), (2L, 3L, 1L), (3L, 3L, 1L),
      (4L, 0L, 0L), (5L, 0L, 0L)))
  }

  test("pipeline --blocklist and --resolve-recrawls compose") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("pipeblock").toString
    // two crawls of the same url: the newer one must survive resolution
    val pages = Seq(
      Page("https://a/1", new java.sql.Timestamp(1000L), null, "alpha beta gamma delta epsilon zeta", "en"),
      Page("https://a/1", new java.sql.Timestamp(2000L), null, "alpha beta gamma delta epsilon NEWER", "en"),
      Page("https://a/2", new java.sql.Timestamp(1000L), null, "spam spam spam spam spam words here", "en"),
      Page("https://a/3", new java.sql.Timestamp(1000L), null, "clean text with several regular tokens", "en")
    ).toDF()
    pages.write.mode("overwrite").parquet(s"$dir/in")
    val args = Pipeline.parse(Array(
      "--input", s"$dir/in", "--output", s"$dir/out",
      "--resolve-recrawls", "--blocklist", "spam,junk", "--block-max-permille", "100"))
    val (kept, _) = Pipeline.run(spark, args)
    val rows = kept.select(col("url"), col("text")).as[(String, String)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq("https://a/1", "https://a/3"))
    assert(rows(0)._2.endsWith("NEWER"), "recrawl resolution must keep the newest snapshot")
  }

  private def repRow(text: String): Map[String, Long] = {
    import spark.implicits._
    val r = TextAnalysis.repetitionStats(Seq((1L, text)).toDF("id", "text"), "id", "text")
      .collect().head
    r.schema.fieldNames.drop(1).map(n => n -> r.getAs[Long](n)).toMap
  }

  test("repetitionStats: hand-computed top-n-gram and dup-n-gram numerators") {
    val r = repRow("a b a b c")
    assert(r("n_word_chars") === 5L)
    assert(r("top_2_chars") === 4L) // "a b" ×2, 2 chars each
    assert(r("top_3_chars") === 3L) // all count 1, gchars tie → "a b a" lexicographic
    assert(r("top_4_chars") === 4L)
    assert(r("dup_5_chars") === 0L) // the single 5-gram occurs once
    // a doc shorter than n yields 0, never throws
    assert(repRow("one")("top_2_chars") === 0L)
    assert(repRow("")("n_word_chars") === 0L)
  }

  test("repetitionStats: dup coverage is an interval UNION (overlaps count once)") {
    // "x y z w v" at positions 0 and 5 → every word covered exactly once
    assert(repRow("x y z w v x y z w v")("dup_5_chars") === 10L)
    // overlapping occurrences of "a a a a a" must not double-count
    assert(repRow("a a a a a a")("dup_5_chars") === 6L)
  }

  test("repetitionStats: top tie-break prefers longer gram then lexicographic") {
    assert(repRow("aa aa b")("top_2_chars") === 4L) // "aa aa" (4) beats "aa b" (3)
  }

  test("repetitionFilter: Gopher thresholds, integer-exact boundary") {
    import spark.implicits._
    // 60 distinct 2-char words: every fraction far under its limit
    val clean = (0 until 60).map(i => f"${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" ")
    val docs = Seq(
      (1L, clean),
      (2L, "aa bb cc dd ee ff gg hh ii jj"), // top2 = 4/20 = exactly 200‰ → ok_top_2
      (3L, "a bb cc dd ee ff gg hh ii jj"),  // top2 = 4/19 > 200‰ → ok_top_2 false
      (4L, "spam spam spam spam spam spam spam spam") // saturated repetition
    ).toDF("id", "text")
    val out = TextAnalysis.repetitionFilter(docs, "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("ok_top_2"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) === ((true, true)))
    assert(out(2L)._1 === true, "exactly-at-threshold must pass (<=)")
    assert(out(3L)._1 === false)
    assert(out(4L)._2 === false)
  }

  test("charLmStats: hand-computed bigram counts, familiarity and perplexity") {
    import spark.implicits._
    // corpus: aa×3 (doc1), ab×2 + ba×1 (doc2); doc3 too short for a bigram
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "b")).toDF("id", "text")
    val out = TextAnalysis.charLmStats(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(out(1L)._1 === 3L)
    assert(out(1L)._2 === 9L) // 3 occurrences × corpus count 3
    assert(out(2L)._2 === 5L) // ab(2) + ba(1) + ab(2)
    assert(out(3L) === ((0L, 0L, None)))
    // T=6, V=3: p(aa) = 4/10 → ppl(doc1) = 1/0.4 = 2.5 exactly
    assert(math.abs(out(1L)._3.get - 2.5) < 1e-9)
    // doc2: (p(ab)² p(ba))^(-1/3) = (0.3²·0.2)^(-1/3)
    assert(math.abs(out(2L)._3.get - math.pow(0.3 * 0.3 * 0.2, -1.0 / 3)) < 1e-9)
  }

  test("charLmStats: vocabK cap sends out-of-vocab bigrams to the UNK slot") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "abab")).toDF("id", "text")
    val out = TextAnalysis.charLmStats(docs, "id", "text", vocabK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === 9L) // "aa" survives the cap (most frequent)
    assert(out(2L) === 0L) // ab/ba evicted → count 0 (smoothing still scores them)
  }

  test("charLmStats: gibberish scores strictly worse than corpus-like text") {
    import spark.implicits._
    val natural = "the quick brown fox jumps over the lazy dog and runs away home "
    val corpus = (0 until 20).map(i => (i.toLong, natural * 3)) :+
      ((99L, "zq xv qj wk vx jz kq xw zj vq")) // bigrams the corpus never repeats
    val out = TextAnalysis.charLmStats(corpus.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val worstNatural = (0 until 20).map(i => out(i.toLong)).max
    assert(out(99L) > worstNatural * 2,
      s"gibberish ppl ${out(99L)} should dominate natural max $worstNatural")
  }

  test("charLmBuckets: per-language terciles; null lang gets an explicit bucket") {
    import spark.implicits._
    val natural = "the quick brown fox jumps over the lazy dog again and again "
    val docs = Seq(
      (1L, natural * 4, "en"),         // cleanest → head
      (2L, natural * 2 + "zzqqxxvv", "en"), // middling
      (3L, "zq xv qj wk vx jz kq xw", "en"), // gibberish → tail
      (4L, natural, null)              // null lang must not vanish
    ).toDF("id", "text", "lang")
    val out = TextAnalysis.charLmBuckets(docs, "id", "text", "lang")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(5))).toMap
    assert(out.size === 4, "every doc must come back exactly once")
    assert(out(1L)._2 === "head")
    assert(out(3L)._2 === "tail")
    assert(out(4L)._1 === "__null__")
  }
  test("fluencyBuckets: exact terciles match ntile semantics; fluent=head, gibberish/bigram-less=tail") {
    import spark.implicits._
    val natural = "the quick brown fox jumps over the lazy dog again and again "
    // 6 'en' docs with strictly decreasing fluency + 1 bigram-less + 1 'de'
    val docs = Seq(
      (1L, natural * 6, "en"),
      (2L, natural * 4 + "zq", "en"),
      (3L, natural * 2 + "zq xv qj", "en"),
      (4L, natural + "zq xv qj wk vx", "en"),
      (5L, "zq xv qj wk vx jz kq", "en"),
      (6L, "qq zz xx vv jj kk ww", "en"),
      (7L, "x", "en"),                     // no bigrams → score 0 → tail
      (8L, natural, "de")                  // own language, own terciles
    ).toDF("id", "text", "lang")
    val out = TextAnalysis.fluencyBuckets(docs, "id", "text", "lang")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out.size === 8, "every doc must come back exactly once")
    // en has n=7: floor(rank*3/7) → ranks 0-2 head, 3-4 middle, 5-6 tail
    assert(out(1L) === (("en", 0L, "head")))
    assert(out(2L) === (("en", 1L, "head")))
    assert(out(3L) === (("en", 2L, "head")))
    assert(out(4L)._3 === "middle")
    assert(out(5L)._3 === "middle")
    assert(out(6L)._3 === "tail")
    assert(out(7L)._3 === "tail", "bigram-less doc must land in tail")
    assert(out(7L)._2 === 6L, "score-0 doc sorts last within its language")
    // de is alone: rank 0 of n=1 → head (its own tercile space)
    assert(out(8L) === (("de", 0L, "head")))
  }

  test("fluencyBuckets: exact terciles over a strict fluency gradient; charLmBuckets agrees at the extremes") {
    import spark.implicits._
    val natural = "the quick brown fox jumps over the lazy dog again and again "
    val gib = "zq xv qj wk vx jz kq xw "
    // strictly decreasing fluency: doc i mixes (9-i) natural reps, i gibberish
    val docs = (0L until 9L).map { i =>
      (i, natural * (9 - i.toInt) + gib * i.toInt, "en")
    }.toDF("id", "text", "lang")
    val exact = TextAnalysis.fluencyBuckets(docs, "id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val expected = Map(0L -> "head", 1L -> "head", 2L -> "head",
      3L -> "middle", 4L -> "middle", 5L -> "middle",
      6L -> "tail", 7L -> "tail", 8L -> "tail")
    assert(exact === expected, "floor(rank*3/n) terciles over the gradient")
    // the approx (percentile_approx) variant may place BOUNDARY docs in the
    // neighboring bucket — that sketch-dependence is exactly why only the
    // exact variant is oracle-gated — but the unique extremes are safe:
    // min ppl is always <= cut1, the unique max is always > cut2.
    val approx = TextAnalysis.charLmBuckets(docs, "id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(approx(0L) === "head")
    assert(approx(8L) === "tail")
  }

  test("scriptCounts: per-script letter buckets, supplementary plane, non-letters skipped") {
    // "abc \u041F\u0440\u0438 \u4E2D\u6587 \u0645 \u03A8 123 !?"
    val mixed = "abc \u041F\u0440\u0438 \u4E2D\u6587 \u0645 \u03A8 123 !?"
    assert(TextAnalysis.scriptCounts(mixed) === ((3L, 3L, 2L, 1L, 1L)))
    // hiragana/katakana/hangul land in the cjk bucket
    assert(TextAnalysis.scriptCounts("\u3042\u30AB\uD55C") === ((0L, 0L, 3L, 0L, 0L)))
    // supplementary-plane letters count ONCE: U+1D400 MATHEMATICAL BOLD A
    // (script COMMON -> other), U+10330 GOTHIC LETTER AHSA (script GOTHIC)
    val supp = new String(Character.toChars(0x1D400)) + new String(Character.toChars(0x10330))
    assert(TextAnalysis.scriptCounts(supp) === ((0L, 0L, 0L, 0L, 2L)))
    assert(TextAnalysis.scriptCounts("123 !?.,") === ((0L, 0L, 0L, 0L, 0L)))
    assert(TextAnalysis.scriptCounts(null) === ((0L, 0L, 0L, 0L, 0L)))
    assert(TextAnalysis.scriptCounts("") === ((0L, 0L, 0L, 0L, 0L)))
  }

  test("scriptStats: distributed table matches scalar scriptCounts") {
    import spark.implicits._
    val rows = Seq((1L, "hello \u041C\u0438\u0440"), (2L, "\u4E2D\u6587 only"), (3L, null.asInstanceOf[String]))
    val out = TextAnalysis.scriptStats(rows.toDF("id", "t"), "id", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((5L, 3L, 0L)))
    assert(out(2L) === ((4L, 0L, 2L)))
    assert(out(3L) === ((0L, 0L, 0L)))
  }

  test("ngramNovelty == brute force on a planted corpus; boilerplate doc scores low") {
    import spark.implicits._
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox sleeps under the old tree", // shares a prefix with 1
      3L -> "completely novel sentence with unique words here",
      4L -> "the quick brown fox jumps over the lazy dog", // exact copy of 1
      5L -> "alpha beta gamma delta epsilon zeta")
    def gramSet(t: String): Set[String] =
      TextNorm.wordShingles(TextNorm.tokenize(t), 3, 5).toSet
    // brute-force truth on raw string grams
    val sets = docs.map { case (id, t) => id -> gramSet(t) }.toMap
    val truth = sets.map { case (id, g) =>
      val shared = g.count(x => sets.exists { case (o, s) => o != id && s(x) })
      id -> ((g.size.toLong, shared.toLong,
        1000L * (g.size - shared) / g.size))
    }
    val in = docs.toDF("id", "text")
      .select($"id", udf { (t: String) =>
        gramSet(t).map(g => Hashes.xxh64Str(g)).toArray
      }.apply($"text").as("set"))
    val out = TextAnalysis.ngramNovelty(in, "id", "set").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === truth)
    assert(out(4L)._3 === 0L, "an exact copy has zero novelty")
    assert(out(3L)._3 === 1000L && out(5L)._3 === 1000L, "unique docs are fully novel")
    assert(out(1L)._2 > 0L && out(1L)._3 < 1000L, "partial overlap detected")
  }

  test("PhraseAutomaton: overlaps, nested phrases, brute-force equality") {
    def brute(text: String, phrases: Seq[String]): Long =
      phrases.map { p =>
        (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong
      }.sum
    // classic hazards: overlapping self-matches, phrase-inside-phrase,
    // shared prefixes, fail-link hop mid-match
    val ac1 = TextAnalysis.PhraseAutomaton(Seq("aa"))
    assert(ac1.countHits("aaaa") === 3L) // overlaps count
    val ac2 = TextAnalysis.PhraseAutomaton(Seq("he", "hers", "his", "she"))
    assert(ac2.countHits("ushers") === 3L) // she, he, hers
    val ac3 = TextAnalysis.PhraseAutomaton(Seq("abcd", "bc"))
    assert(ac3.countHits("abcd") === 2L)
    assert(TextAnalysis.PhraseAutomaton(Seq("x")).countHits("") === 0L)
    assert(TextAnalysis.PhraseAutomaton(Seq("x")).countHits(null) === 0L)
    // duplicate phrase in the list counts twice (list semantics)
    assert(TextAnalysis.PhraseAutomaton(Seq("ab", "ab")).countHits("ab") === 2L)
    // non-ASCII edges take the wide path
    assert(TextAnalysis.PhraseAutomaton(Seq("héllo", "é")).countHits("héllo é") === 3L)
    // randomized brute-force equality over a small alphabet (dense matches)
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 50) {
      val text = Array.fill(200)(('a' + rnd.nextInt(3)).toChar).mkString
      val phrases = (0 until 5).map(_ =>
        Array.fill(1 + rnd.nextInt(4))(('a' + rnd.nextInt(3)).toChar).mkString)
      val ac = TextAnalysis.PhraseAutomaton(phrases)
      assert(ac.countHits(text) === brute(text, phrases), s"trial $trial $phrases")
    }
  }

  test("phraseHits: distributed counts equal the automaton, zero shuffle") {
    import spark.implicits._
    val docs = Seq(
      (1L, "batch batch batch stream"),
      (2L, "no match here"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val got = TextAnalysis.phraseHits(docs, "id", "text", Seq("batch batch", "stream"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 3L), (2L, 0L), (3L, 0L))) // 2 overlapping + stream
    val plan = TextAnalysis.phraseHits(docs, "id", "text", Seq("x"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"phraseHits must not shuffle:\n$plan")
  }

  test("bm25TopK: hand-computed integer scores, tie-break, partition invariance") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark spark hash"),
      (1L, "window window window window"),
      (2L, "spark a b c"),
      (3L, "x y")).toDF("id", "text")
    // N=4, Σdl=13 → avgdlMilli=3250; df: spark 2, window 1, hash 1;
    // idf2 = bitlen(5)-bitlen(df+1) = 1 for all three.
    // norm(dl) = 250 + 750·dl·1000 DIV 3250; denomPart = 1200·norm DIV 1000:
    //   dl3→1130, dl4→1407, dl2→853
    // scoreT = tf·2200·10⁶ DIV (tf·1000 + denomPart):
    //   d0 = spark(tf2): 4.4e9 DIV 3130 = 1405750; hash(tf1): 2.2e9 DIV 2130
    //        = 1032863 → 2438613
    //   d1 = window(tf4): 8.8e9 DIV 5407 = 1627519
    //   d2 = spark(tf1): 2.2e9 DIV 2407 = 914000
    val out = TextAnalysis.bm25TopK(docs, "id", "text",
      Seq("spark", "window", "hash"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (0L, 3L, 2438613L), (1L, 4L, 1627519L), (2L, 4L, 914000L), (3L, 2L, 0L)))

    // k truncates after the deterministic (score desc, id asc) order
    val top1 = TextAnalysis.bm25TopK(docs, "id", "text",
      Seq("spark", "window", "hash"), 1).collect()
    assert(top1.length === 1 && top1(0).getLong(0) === 0L)

    // identical scores tie-break by ascending id (two identical docs)
    val ties = Seq((7L, "spark x"), (5L, "spark x"), (9L, "y z")).toDF("id", "text")
    val t = TextAnalysis.bm25TopK(ties, "id", "text", Seq("spark"), 2)
      .collect().map(_.getLong(0)).toSeq
    assert(t === Seq(5L, 7L))

    // partition layout cannot change scores or order
    val repart = TextAnalysis.bm25TopK(docs.repartition(7), "id", "text",
      Seq("spark", "window", "hash"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(repart === out.toSeq.map(r => (r._1, r._3)))

    // a term absent from the corpus (df=0) contributes 0, never throws
    val absent = TextAnalysis.bm25TopK(docs, "id", "text",
      Seq("zzznotthere"), 4).collect()
    assert(absent.forall(_.getLong(2) === 0L))

    // empty corpus → empty result, correct schema
    val empty = TextAnalysis.bm25TopK(docs.limit(0), "id", "text", Seq("spark"), 3)
    assert(empty.columns.toSeq === Seq("id", "dl", "score_micro"))
    assert(empty.count() === 0L)
  }

  test("sharedGramMatrix: per-pair distinct shared grams, duplicates-free, hash-invariant") {
    import spark.implicits._
    // groups: en shares {g1,g2} with de, {g1} with fr; de-fr share {g1};
    // within-group duplicates (two en docs both carrying g1) count once
    val in = Seq(
      ("en", Array("g1", "g2", "enonly")),
      ("en", Array("g1", "enonly2")),
      ("de", Array("g1", "g2", "deonly")),
      ("fr", Array("g1", "fronly"))).toDF("lang", "set")
    val out = TextAnalysis.sharedGramMatrix(in, "lang", "set")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set(("de", "en", 2L), ("de", "fr", 1L), ("en", "fr", 1L)))
    // hash-invariance: identical counts on hashed sets
    val hashed = in.select(col("lang"),
      transform(col("set"), g => xxhash64(g)).as("set"))
    val outH = TextAnalysis.sharedGramMatrix(hashed, "lang", "set")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(outH === out)
    // a corpus-hot gram (in every group) fans out #groups^2 pairs, not docs^2
    val hot = (0 until 200).map(i => (s"l${i % 4}", Array("hot"))).toDF("lang", "set")
    val outHot = TextAnalysis.sharedGramMatrix(hot, "lang", "set")
      .collect().map(r => r.getLong(2)).toSeq
    assert(outHot.size === 6 && outHot.forall(_ === 1L)) // C(4,2) pairs, 1 gram
  }
}

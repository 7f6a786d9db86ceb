package dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (and drop) training documents that share
  * any word n-gram with a benchmark/eval set — the GPT-3/Pile practice of
  * 13-gram-overlap decontamination, without which eval scores are inflated
  * by test data leaking into the training corpus.
  *
  * Scale shape: the two sides are wildly asymmetric — the benchmark is
  * thousands of documents (~10^5..10^6 distinct n-grams), the corpus is
  * 10^12. So the benchmark's gram hashes are collected ONCE into a sorted
  * `Array[Long]` (8 bytes per gram, no boxing) and broadcast; every
  * training document is then scanned in a single zero-shuffle projection —
  * tokenize, slide the n-window, binary-search each gram hash. Per-doc cost
  * is O(tokens · log |bench grams|); the corpus side never explodes its
  * grams into rows (a grams×docs blow-up feeding a shuffle join — the plan
  * you must NOT write at this asymmetry).
  *
  * Gram identity is xxh64 of the space-joined token window (same tokenizer
  * as the dedup family: TextNorm.tokenize, `(?U)\W`). A 64-bit hash
  * collision could over-flag one doc per ~10^9 distinct grams — acceptable
  * for contamination removal (precision-first would re-check strings; the
  * reference pipelines accept hash identity too).
  */
object Decontaminate {

  /** Distinct xxh64 hashes of every word n-gram in the doc, in first-seen
    * order. Docs with fewer than n tokens have no n-gram (unlike the
    * MinHash shingler's whole-doc rule — a short doc cannot "contain" a
    * benchmark passage). */
  private[dedup] def gramHashes(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val toks = TextNorm.tokenize(text)
    if (toks.length < n) return Array.emptyLongArray
    val out = new scala.collection.mutable.ArrayBuffer[Long](toks.length - n + 1)
    val seen = new java.util.HashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = Hashes.xxh64Str(sb.toString)
      if (seen.add(h)) out += h
      i += 1
    }
    out.toArray
  }

  /** Sorted distinct gram-hash index of the benchmark set (small side;
    * collected to the driver for broadcast). The distinct runs
    * distributed — only unique hashes cross to the driver. */
  def benchmarkIndex(bench: DataFrame, textCol: String, n: Int): Array[Long] = {
    val spark = bench.sparkSession
    import spark.implicits._
    val hashes = bench.select(col(textCol).cast("string")).as[String]
      .mapPartitions(_.flatMap(t => gramHashes(t, n)))
      .distinct()
      .collect()
    java.util.Arrays.sort(hashes)
    hashes
  }

  /** Adds `n_hits` (distinct benchmark n-grams found in the doc) and
    * `contaminated` to every row — one zero-shuffle projection over the
    * corpus, probing the broadcast sorted index. */
  def flag(docs: DataFrame, textCol: String, index: Array[Long], n: Int): DataFrame = {
    require(n > 0, s"gram width must be positive, got $n")
    val bc = docs.sparkSession.sparkContext.broadcast(index)
    val nHits = udf { (text: String) =>
      val idx = bc.value
      var hits = 0L
      val grams = gramHashes(text, n)
      var i = 0
      while (i < grams.length) {
        if (java.util.Arrays.binarySearch(idx, grams(i)) >= 0) hits += 1
        i += 1
      }
      hits
    }
    docs.withColumn("n_hits", nHits(col(textCol).cast("string")))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** End-to-end: drop every corpus doc sharing an n-gram with `bench`. */
  def clean(docs: DataFrame, bench: DataFrame, textCol: String, n: Int): DataFrame =
    flag(docs, textCol, benchmarkIndex(bench, textCol, n), n)
      .where(!col("contaminated"))
      .drop("n_hits", "contaminated")

  /** FRACTIONAL overlap gate (the GPT-3-appendix / Dolma variant of
    * [[flag]]'s any-hit rule): a doc is kept while its contaminated share
    * of distinct n-grams stays ≤ `maxPct` percent — one long quote in an
    * otherwise-original page survives, a wholesale benchmark copy dies.
    * The predicate is integer-exact (`n_hits·100 ≤ n_grams·maxPct`, no
    * float boundary), docs too short to have any n-gram are kept, and the
    * scan shape is identical to [[flag]]: zero shuffle, one broadcast
    * sorted-index probe per doc. Adds `n_grams`, `n_hits`, `keep`. */
  def overlapStats(docs: DataFrame, textCol: String, index: Array[Long],
      n: Int, maxPct: Int): DataFrame = {
    require(n > 0, s"gram width must be positive, got $n")
    require(maxPct >= 0 && maxPct <= 100, s"maxPct must be 0..100, got $maxPct")
    val bc = docs.sparkSession.sparkContext.broadcast(index)
    val stats = udf { (text: String) =>
      val idx = bc.value
      val grams = gramHashes(text, n)
      var hits = 0L
      var i = 0
      while (i < grams.length) {
        if (java.util.Arrays.binarySearch(idx, grams(i)) >= 0) hits += 1
        i += 1
      }
      (grams.length.toLong, hits)
    }
    docs.withColumn("__ov", stats(col(textCol).cast("string")))
      .withColumn("n_grams", col("__ov._1"))
      .withColumn("n_hits", col("__ov._2"))
      .withColumn("keep", col("n_hits") * 100 <= col("n_grams") * maxPct)
      .drop("__ov")
  }
}

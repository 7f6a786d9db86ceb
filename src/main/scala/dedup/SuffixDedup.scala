package dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Long-exact-substring duplicate stage (north_rule; the reference only
  * cites Lee et al. 2022 "Deduplicating Training Data Makes Language Models
  * Better" / deduplicate-text-datasets at README.md:25 — no implementation
  * exists there).
  *
  * A monolithic corpus-wide suffix array is the single-node formulation; the
  * Spark-native equivalent is winnowing (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03):
  *
  *   1. per doc, hash every k-char window and select window minima over
  *      sliding windows of w positions (monotonic-deque, O(len)); by the
  *      winnowing guarantee, two docs sharing an exact run of
  *      ≥ L = w + k − 1 chars share at least one selected anchor;
  *   2. group by anchor (salted star edges — same machinery as LSH buckets,
  *      hot anchors are boilerplate headers);
  *   3. verify each candidate pair exactly: binary-search the longest
  *      common substring with a rolling hash + regionMatches confirmation,
  *      keep pairs with a common run ≥ L.
  *
  * Docs shorter than L chars cannot participate and are skipped at step 1,
  * so the anchor volume is bounded by corpus chars / w. The stage only adds
  * edges to the shared CC edge stream — it can extend clusters, never split
  * them (SURVEY.md §7 slice 4).
  */
object SuffixDedup {

  val KGram = 64 // anchor k-gram width in chars

  /** Winnowing anchors of one doc: xxh64 values of selected k-grams. */
  def anchors(text: String, minRun: Int): Array[Long] = {
    val k = KGram
    if (text == null || text.length < math.max(minRun, k)) return Array.emptyLongArray
    val w = math.max(1, minRun - k + 1)
    val m = text.length - k + 1 // number of k-grams
    // rolling Karp-Rabin over chars (O(len), no per-window substring), then
    // a splitmix finalizer for spread; content-determinism is all the
    // winnowing guarantee needs — collisions only create candidates, which
    // the exact longest-common-run verification prunes
    val hs = new Array[Long](m)
    val B = 0x100000001B3L
    var bk = 1L // B^k
    var i = 0
    while (i < k) { bk *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    var p = 0
    while (p < m) {
      var z = h + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      hs(p) = z ^ (z >>> 31)
      if (p + k < text.length) h = h * B + text.charAt(p + k) - text.charAt(p) * bk
      p += 1
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    // sliding-window minima via monotonic deque (unsigned compare)
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < m) {
      while (!deque.isEmpty && java.lang.Long.compareUnsigned(hs(deque.peekLast()), hs(i)) >= 0)
        deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - w) deque.pollFirst()
      if (i >= w - 1) out.add(hs(deque.peekFirst()))
      i += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    arr
  }

  /** Longest common substring length of two strings: binary search on the
    * answer with a position-map rolling comparison; every hash hit is
    * confirmed with regionMatches, so the result is exact. */
  def longestCommonRun(a: String, b: String): Int = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0
    var lo = 0
    var hi = math.min(a.length, b.length)
    def hasCommon(l: Int): Boolean = {
      val seen = new java.util.HashMap[Long, java.util.ArrayList[Integer]]()
      val base = 1000003L
      var pow = 1L
      var i = 1
      while (i < l) { pow *= base; i += 1 }
      var h = 0L
      i = 0
      while (i < l) { h = h * base + a.charAt(i); i += 1 }
      var start = 0
      while (start + l <= a.length) {
        seen.computeIfAbsent(h, _ => new java.util.ArrayList[Integer]()).add(start)
        if (start + l < a.length) h = (h - a.charAt(start) * pow) * base + a.charAt(start + l)
        start += 1
      }
      h = 0L
      i = 0
      while (i < l) { h = h * base + b.charAt(i); i += 1 }
      start = 0
      while (start + l <= b.length) {
        val hits = seen.get(h)
        if (hits != null) {
          val it = hits.iterator()
          while (it.hasNext) {
            if (a.regionMatches(it.next(), b, start, l)) return true
          }
        }
        if (start + l < b.length) h = (h - b.charAt(start) * pow) * base + b.charAt(start + l)
        start += 1
      }
      false
    }
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (hasCommon(mid)) lo = mid else hi = mid - 1
    }
    lo
  }

  /** docs(id, text) → verified edges (src, dst, run) with an exact common
    * substring of ≥ cfg.suffixMinRun chars. */
  def verifiedEdges(docs: DataFrame, cfg: DedupConfig): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val minRun = cfg.suffixMinRun
    val texts = docs.select(col(cfg.idCol).cast("long").as("id"), col(cfg.textCol).as("text"))
    val anchorKeys: Dataset[BandKey] = texts.as[(Long, String)]
      .flatMap { case (id, text) =>
        anchors(text, minRun).iterator.map(a => BandKey(id, 0, a))
      }
    val cand = Lsh.groupEdges(anchorKeys, cfg.saltBuckets,
      cfg.allPairsCap, cfg.chainEdges)
    val t1 = texts.select(col("id").as("src"), col("text").as("text_src"))
    val t2 = texts.select(col("id").as("dst"), col("text").as("text_dst"))
    val lcr = udf { (a: String, b: String) => longestCommonRun(a, b) }
    cand.hint("shuffle_hash")
      .join(t1, "src")
      .hint("shuffle_hash") // keep the candidate-sized side the build side
      .join(t2, "dst")
      .withColumn("run", lcr(col("text_src"), col("text_dst")))
      .where(col("run") >= lit(minRun))
      .select(col("src"), col("dst"), col("run"))
  }
}

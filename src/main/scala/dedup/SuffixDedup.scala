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

  /** Start positions in `b` of length-`l` grams that also occur anywhere in
    * `a` (rolling-hash candidates, every hit confirmed with regionMatches —
    * exact), merged into disjoint [start, end) intervals.
    *
    * Coverage by matching l-grams EQUALS coverage by maximal common runs of
    * length ≥ l: a common run of length R ≥ l starting at q contributes
    * matching l-grams at q..q+R−l, whose union covers [q, q+R); conversely
    * any matching l-gram is itself a common run of length l. So the merged
    * intervals are exactly the characters of `b` lying inside some ≥l-char
    * exact substring shared with `a`. */
  def coveredIntervals(a: String, b: String, l: Int): Array[(Int, Int)] = {
    if (a == null || b == null || a.length < l || b.length < l) return Array.empty
    val base = 1000003L
    var pow = 1L
    var i = 1
    while (i < l) { pow *= base; i += 1 }
    val starts = new java.util.HashMap[Long, java.util.ArrayList[Integer]]()
    var h = 0L
    i = 0
    while (i < l) { h = h * base + a.charAt(i); i += 1 }
    var s = 0
    while (s + l <= a.length) {
      starts.computeIfAbsent(h, _ => new java.util.ArrayList[Integer]()).add(s)
      if (s + l < a.length) h = (h - a.charAt(s) * pow) * base + a.charAt(s + l)
      s += 1
    }
    val hits = new scala.collection.mutable.ArrayBuffer[Int]()
    h = 0L
    i = 0
    while (i < l) { h = h * base + b.charAt(i); i += 1 }
    s = 0
    while (s + l <= b.length) {
      val cand = starts.get(h)
      if (cand != null) {
        val it = cand.iterator()
        var found = false
        while (!found && it.hasNext) {
          if (a.regionMatches(it.next(), b, s, l)) { found = true; hits += s }
        }
      }
      if (s + l < b.length) h = (h - b.charAt(s) * pow) * base + b.charAt(s + l)
      s += 1
    }
    // merge [q, q+l) windows over ascending q
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    hits.foreach { q =>
      if (out.nonEmpty && q <= out.last._2) {
        val (st, _) = out.last
        out(out.length - 1) = (st, q + l)
      } else out += ((q, q + l))
    }
    out.toArray
  }

  /** Cut, from each document, every character lying inside an exact run of
    * ≥ cfg.suffixMinRun chars that also occurs in a SMALLER-id document —
    * the substring-removal semantics of Lee et al. 2022 (the reference's
    * acknowledged inspiration, README.md:25: deduplicate-text-datasets
    * removes the duplicated span, not the whole doc), with "keep the
    * earliest occurrence" as the deterministic survivor rule (the engine's
    * min-id convention). Returns (id, text_clean, n_removed) for EVERY
    * input doc (untouched docs pass through with n_removed = 0).
    *
    * Distributed shape: winnowing anchors → salted candidate buckets (the
    * verifiedEdges front end — a pair sharing a ≥minRun run provably shares
    * an anchor), per-pair covered intervals on the larger-id side (O(len)
    * rolling scan, never O(len²)), then one groupBy(id) interval union.
    * Nothing here is quadratic in doc length or cluster size except the
    * candidate pair count itself, which the salt/cap topology already
    * bounds. */
  def removeRuns(docs: DataFrame, cfg: DedupConfig): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val minRun = cfg.suffixMinRun
    val texts = docs.select(col(cfg.idCol).cast("long").as("id"), col(cfg.textCol).as("text"))
    val anchorKeys: Dataset[BandKey] = texts.as[(Long, String)]
      .flatMap { case (id, text) =>
        anchors(text, minRun).iterator.map(a => BandKey(id, 0, a))
      }
    // groupEdges normalizes src > dst: remove from src, matching against dst
    val cand = Lsh.groupEdges(anchorKeys, cfg.saltBuckets, cfg.allPairsCap, cfg.chainEdges)
    val t1 = texts.select(col("id").as("src"), col("text").as("text_src"))
    val t2 = texts.select(col("id").as("dst"), col("text").as("text_dst"))
    val ivs = udf { (a: String, b: String) =>
      // intervals covered in the LARGER-id doc (text_src), matched against
      // the smaller-id text_dst
      coveredIntervals(b, a, minRun).map { case (st, en) => Array(st, en) }
    }
    val perDoc = cand.hint("shuffle_hash")
      .join(t1, "src")
      .hint("shuffle_hash")
      .join(t2, "dst")
      .select(col("src").as("id"), ivs(col("text_src"), col("text_dst")).as("iv"))
      .where(size(col("iv")) > 0)
      .groupBy(col("id"))
      .agg(flatten(collect_list(col("iv"))).as("iv"))
    val apply = udf { (text: String, iv: Seq[Seq[Int]]) =>
      if (text == null || iv == null || iv.isEmpty) (text, 0L)
      else {
        val sorted = iv.map(p => (p(0), p(1))).sortBy(_._1)
        val sb = new java.lang.StringBuilder(text.length)
        var pos = 0
        var removed = 0L
        sorted.foreach { case (st, en) =>
          if (st > pos) sb.append(text, pos, st)
          val from = math.max(st, pos)
          if (en > from) removed += en - from
          pos = math.max(pos, en)
        }
        if (pos < text.length) sb.append(text, pos, text.length)
        (sb.toString, removed)
      }
    }
    texts.join(perDoc, Seq("id"), "left")
      .withColumn("r", apply(col("text"), col("iv")))
      .select(col("id"),
        coalesce(col("r").getField("_1"), col("text")).as("text_clean"),
        coalesce(col("r").getField("_2"), lit(0L)).as("n_removed"))
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

package dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING over the corpus (Sennrich et al. 2016, the
  * algorithm behind GPT-2/RoBERTa-class vocabularies) — the
  * train-a-tokenizer-on-your-corpus step of a training-data pipeline,
  * complementing the fixed `TextAnalysis` token counters.
  *
  * Work split, sized for 10¹² docs:
  *   - CORPUS-scale work = word-frequency counting: one partial-aggregated
  *     shuffle + a per-partition-heap top-K (`TakeOrderedAndProject` via
  *     [[TextAnalysis.topWords]]) — never a global sort, never an
  *     uncapped dictionary (an uncapped distinct-word table is unbounded
  *     on web text; the cap is the same bounded-broadcast discipline as
  *     `rareTokenStats`/`charLmStats`).
  *   - DICT-scale work = merge-rule learning over the capped word-freq
  *     dict: driver math like `Lsh.optimalParam` (the dict is bounded BY
  *     CONSTRUCTION, so this is O(vocabK·len·merges), not corpus-scale).
  *     Ties break (count desc, pair lexicographic asc) so training is
  *     deterministic across partitionings and reruns.
  *   - ENCODE = greedy lowest-rank merge application per word: broadcast
  *     rank map, zero-shuffle projection, O(len²) worst case per word on
  *     bounded word length.
  *
  * Not SQL-derivable (iterative state), so suite-gated like KMeans:
  * pinned against an independent naive implementation + the published
  * low/lower/newest/widest worked example.
  */
object Bpe {

  /** End-of-word marker, a distinct symbol per the original formulation. */
  val EndOfWord = "</w>"

  type Dict = Array[(String, Long)]

  /** Distributed word-frequency dictionary, capped at the top `vocabK`
    * words (count desc, word asc). Lowercased whitespace tokens.
    * Lowercasing uses the SAME JVM closure (`toLowerCase(Locale.ROOT)`)
    * the encoder applies — Catalyst's `lower()` is locale-independent
    * only on the ASCII fast path; UTF8String's non-ASCII fallback goes
    * through the JVM DEFAULT locale, so on e.g. a tr-TR JVM a word mixing
    * 'I' with non-ASCII chars would train and encode as different symbol
    * sequences and its merges would never apply (ADVICE r3). */
  def wordCounts(docs: DataFrame, textCol: String, vocabK: Int): Dict = {
    val lowerRoot = udf { (s: String) =>
      if (s == null) null else s.toLowerCase(java.util.Locale.ROOT)
    }
    TextAnalysis.topWords(
        docs.select(lowerRoot(col(textCol)).as("__bpe_text")), "__bpe_text", vocabK)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
  }

  private def toSymbols(word: String): Array[String] = {
    val cps = word.codePoints().toArray
    val out = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) { out(i) = new String(Character.toChars(cps(i))); i += 1 }
    out(cps.length) = EndOfWord
    out
  }

  /** Learn `numMerges` merge rules from a word-freq dict. Returns merges
    * in learned order (rank = index). Stops early when no pair occurs
    * twice. */
  def learnMerges(dict: Dict, numMerges: Int): Array[(String, String)] = {
    val words = dict.map { case (w, c) => (toSymbols(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var step = 0
    var continue = true
    while (step < numMerges && continue) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          if (syms(i) != null) {
            var j = i + 1
            while (j < syms.length && syms(j) == null) j += 1
            if (j < syms.length) {
              val k = (syms(i), syms(j))
              counts.put(k, counts.getOrElse(k, 0L) + c)
            }
            i = j
          } else i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        // deterministic argmax: count desc, then pair lexicographic asc
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (best._2 < 2) continue = false // nothing repeats: no compression left
        else {
          val (l, r) = best._1
          merges += ((l, r))
          // in-place merge of every adjacent (l, r) occurrence
          words.foreach { case (syms, _) =>
            var i = 0
            while (i < syms.length) {
              if (syms(i) == l) {
                var j = i + 1
                while (j < syms.length && syms(j) == null) j += 1
                if (j < syms.length && syms(j) == r) {
                  syms(i) = l + r
                  syms(j) = null
                }
              }
              i += 1
            }
          }
          step += 1
        }
      }
    }
    merges.toArray
  }

  /** Greedy BPE encode of one (lowercased) word: repeatedly merge the
    * LOWEST-rank adjacent pair present (the standard apply order — rank
    * order, not left-to-right). */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms = toSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val merged = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, merged, 0, bestIdx)
        merged(bestIdx) = syms(bestIdx) + syms(bestIdx + 1)
        System.arraycopy(syms, bestIdx + 2, merged, bestIdx + 1,
          syms.length - bestIdx - 2)
        syms = merged
      }
    }
    syms
  }

  private def rankMap(merges: Array[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.map { case (m, i) => m -> i }.toMap

  /** text column → array<string> of BPE tokens (zero-shuffle projection;
    * the rank map rides the closure like the MinHash permutations). */
  def tokensCol(text: Column, merges: Array[(String, String)]): Column = {
    val rank = rankMap(merges)
    val fn = udf { (s: String) =>
      if (s == null) Array.empty[String]
      // Locale.ROOT: the same closure wordCounts trains with; a tr-TR
      // default locale would otherwise emit symbols ('ı') the merge
      // table never saw
      else s.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, rank))
    }
    fn(text)
  }

  /** text column → BPE token count (the training-cost/shard-budget number). */
  def tokenCountCol(text: Column, merges: Array[(String, String)]): Column =
    size(tokensCol(text, merges)).cast("long")

  /** One-call convenience: fit on the corpus, return the merge table. */
  def fit(docs: DataFrame, textCol: String, numMerges: Int,
      vocabK: Int = 100000): Array[(String, String)] =
    learnMerges(wordCounts(docs, textCol, vocabK), numMerges)
}

package dedup

import java.util.Locale
import java.util.regex.Pattern

/** Tokenization + shingling with reference-identical semantics.
  *
  * Reference (fuzzy_spark2.py:33,80-148, the flagship pipeline):
  *  - tokens  = re.split(r"\W", content.lower())  — UNICODE \W, empty tokens
  *    are KEPT (fuzzy_spark.py:346 drops them; we pin the flagship semantics,
  *    SURVEY.md §2.4 F1).
  *  - shingles = sliding n-grams of tokens, joined with " "; if
  *    len(tokens) < n the single whole-token-sequence shingle is emitted
  *    (fuzzy_spark2.py:111-112); if len(tokens) < min_length => no shingles
  *    (fuzzy_spark2.py:150-178).
  *  - each shingle is hashed with xxh32(utf8, seed=0) and deduped to a set
  *    (fuzzy_spark2.py:119-148).
  *
  * The GPU family instead uses character n-grams of width 24
  * (fuzzy multi gpu/minhash_multi.py:17-24); `charShingleHashes` keeps that
  * mode available.
  */
object TextNorm {

  /** Java equivalent of Python `re.split(r"\W", s, flags=re.UNICODE)`. */
  private val NonWord: Pattern = Pattern.compile("(?U)\\W")

  /** Lowercase + split on unicode non-word chars; empty tokens kept
    * (including leading/trailing), matching `re.split`. */
  def tokenize(text: String): Array[String] =
    NonWord.split(text.toLowerCase(Locale.ROOT), -1)

  /** Token count as the min-length filter sees it (reference
    * fuzzy_spark2.py:150-178 counts ALL split results, empties included). */
  def tokenCount(text: String): Int = tokenize(text).length

  /** Word n-gram shingle strings. Empty iterator if fewer than `minLength`
    * tokens; a single whole-sequence shingle if fewer than `n` tokens. */
  def wordShingles(tokens: Array[String], n: Int, minLength: Int): Iterator[String] = {
    if (tokens.length < minLength) Iterator.empty
    else if (tokens.length < n) Iterator.single(tokens.mkString(" "))
    else tokens.iterator.sliding(n).withPartial(false).map(_.mkString(" "))
  }

  /** Sorted, distinct xxh32 hashes of word n-gram shingles — the per-doc
    * shingle set used for both MinHash lanes and exact-Jaccard verification. */
  def shingleHashes(text: String, n: Int, minLength: Int): Array[Int] = {
    val toks = tokenize(text)
    if (toks.length < minLength) return Array.emptyIntArray
    if (toks.length < n) return Array(Hashes.xxh32Str(toks.mkString(" ")))
    val m = toks.length - n + 1
    // hash the (token ⊕ ' ')-joined utf-8 byte stream directly — bit-
    // identical to xxh32 of the joined String, but no String/StringBuilder
    // per shingle (the shingler's garbage was 23% of wall as GC at 32
    // threads, BENCH/BASELINE.md)
    val tokBytes = new Array[Array[Byte]](toks.length)
    var t = 0
    while (t < toks.length) {
      tokBytes(t) = toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      t += 1
    }
    val hs = new Array[Int](m)
    val stream = new Hashes.Xxh32Stream(0)
    var i = 0
    while (i < m) {
      stream.reset()
      var j = 0
      while (j < n) {
        if (j > 0) stream.update(' '.toByte)
        val b = tokBytes(i + j)
        stream.update(b, 0, b.length)
        j += 1
      }
      hs(i) = stream.digest()
      i += 1
    }
    sortedDistinct(hs)
  }

  /** in-place sort + dedupe (primitive, no boxing — this is per-doc hot). */
  private[dedup] def sortedDistinct(hs: Array[Int]): Array[Int] = {
    java.util.Arrays.sort(hs)
    var k = 0
    var i = 0
    while (i < hs.length) {
      if (k == 0 || hs(k - 1) != hs(i)) { hs(k) = hs(i); k += 1 }
      i += 1
    }
    if (k == hs.length) hs else java.util.Arrays.copyOf(hs, k)
  }

  /** Character n-gram shingle hashes (GPU-family parity mode: width-24 char
    * windows, reference fuzzy multi gpu/minhash_multi.py:72-94). Lowercased
    * like the word mode; hashes are xxh32 of the raw window. */
  def charShingleHashes(text: String, width: Int, minLength: Int): Array[Int] = {
    val s = text.toLowerCase(Locale.ROOT)
    if (s.length < minLength) return Array.emptyIntArray
    if (s.length <= width) return Array(Hashes.xxh32Str(s))
    val m = s.length - width + 1
    val hs = new Array[Int](m)
    var i = 0
    while (i < m) {
      hs(i) = Hashes.xxh32Str(s.substring(i, i + width))
      i += 1
    }
    sortedDistinct(hs)
  }
}

package dedup

import org.scalatest.funsuite.AnyFunSuite

class TextNormSpec extends AnyFunSuite {

  test("tokenize: python re.split(r\"\\W\") parity — empties kept") {
    assert(TextNorm.tokenize("a b").toSeq === Seq("a", "b"))
    assert(TextNorm.tokenize("a  b").toSeq === Seq("a", "", "b"))
    assert(TextNorm.tokenize("  ab").toSeq === Seq("", "", "ab"))
    assert(TextNorm.tokenize("ab ").toSeq === Seq("ab", ""))
    assert(TextNorm.tokenize("").toSeq === Seq(""))
    assert(TextNorm.tokenize("A,B!c").toSeq === Seq("a", "b", "c"))
    // unicode word chars survive (\W is unicode-aware like re.UNICODE)
    assert(TextNorm.tokenize("héllo wörld").toSeq === Seq("héllo", "wörld"))
    assert(TextNorm.tokenize("नमस्ते दुनिया").length === 2)
  }

  test("ngrams docstring vectors (reference fuzzy_spark2.py:100-112)") {
    val abcd = Array("a", "b", "c", "d")
    // 2-grams of 4 tokens -> 3
    assert(TextNorm.wordShingles(abcd, 2, 1).toSeq === Seq("a b", "b c", "c d"))
    // min_length 5 -> empty
    assert(TextNorm.wordShingles(abcd, 2, 5).isEmpty)
    // fewer tokens than n -> single whole-sequence shingle
    assert(TextNorm.wordShingles(Array("a", "b"), 3, 1).toSeq === Seq("a b"))
  }

  test("shingleHashes: sorted, distinct, matches xxh32 of joined grams") {
    val sh = TextNorm.shingleHashes("a b c d", 2, 1)
    val expect = Seq("a b", "b c", "c d").map(Hashes.xxh32Str(_)).distinct.sorted
    assert(sh.toSeq === expect)
    // repeated grams dedupe to a set (fuzzy_spark2.py:119-148)
    val rep = TextNorm.shingleHashes("x y x y x y", 2, 1)
    assert(rep.length === rep.distinct.length)
    assert(rep.toSeq === rep.sorted.toSeq)
  }

  test("shingleHashes honors min-length on ALL split tokens (empties count)") {
    // "a  b" tokenizes to 3 tokens (with the empty), so minLength=3 passes
    assert(TextNorm.shingleHashes("a  b", 2, 3).nonEmpty)
    assert(TextNorm.shingleHashes("a b", 2, 3).isEmpty)
  }

  test("charShingleHashes: width windows, lowercased") {
    val sh = TextNorm.charShingleHashes("ABCDE", 3, 1)
    val expect = Seq("abc", "bcd", "cde").map(Hashes.xxh32Str(_)).distinct.sorted
    assert(sh.toSeq === expect)
    assert(TextNorm.charShingleHashes("ab", 3, 1).toSeq === Seq(Hashes.xxh32Str("ab")))
  }
}

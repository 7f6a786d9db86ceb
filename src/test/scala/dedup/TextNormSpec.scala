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

  test("fused shingleHashes == reference formulation (Pattern split + String join " +
    "+ one-shot xxh32) on random unicode text (property)") {
    def oracle(text: String, n: Int, minLength: Int): Array[Int] = {
      val toks = TextNorm.tokenize(text)
      if (toks.length < minLength) Array.emptyIntArray
      else if (toks.length < n) Array(Hashes.xxh32Str(toks.mkString(" ")))
      else {
        val hs = toks.sliding(n).map(w => Hashes.xxh32Str(w.mkString(" "))).toArray
        hs.distinct.sorted
      }
    }
    val rnd = new scala.util.Random(13)
    val alphabets = Seq(
      "abc def 123 __x",                 // ascii
      "äöü ß é ñ 漢字 ウル 🙂 ‍ –", // unicode word + non-word + emoji + ZWJ
      "a\tb\nc;d.e")                     // separators
    for (trial <- 0 until 300) {
      val alpha = alphabets(trial % alphabets.length)
      val len = rnd.nextInt(60)
      val text = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      for (n <- Seq(2, 3, 5); ml <- Seq(1, 3)) {
        val got = TextNorm.shingleHashes(text, n, ml).toSeq
        val exp = oracle(text, n, ml).toSeq
        assert(got === exp, s"text=${text.map(c => f"\\u${c.toInt}%04x").mkString} n=$n ml=$ml")
      }
    }
  }

  test("nfc: composes combining sequences, maps compatibility chars, fast-path identity") {
    // e + COMBINING ACUTE (U+0301) -> U+00E9; ANGSTROM SIGN U+212B -> U+00C5
    assert(TextNorm.nfc("cafe\u0301") === "caf\u00E9")
    assert(TextNorm.nfc("\u212B") === "\u00C5")
    // already-composed input is unchanged
    assert(TextNorm.nfc("caf\u00E9") === "caf\u00E9")
    // pure-ASCII fast path returns the SAME reference (no allocation)
    val s = "plain ascii web text"
    assert(TextNorm.nfc(s) eq s)
    // composed Latin-1 (all cps < U+0300) takes the fast path and is
    // legitimately NFC-stable
    val latin1 = "d\u00E9j\u00E0 vu"
    assert(TextNorm.nfc(latin1) eq latin1)
    assert(TextNorm.nfc(null) === null)
    assert(TextNorm.nfc("") === "")
  }

  test("isWordCp == Java regex (?U)\\w on the BMP + supplementary samples (property)") {
    val p = java.util.regex.Pattern.compile("(?U)\\w")
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 4000) {
      val cp = rnd.nextInt(0x10000)
      if (!Character.isSurrogate(cp.toChar)) {
        val s = new String(Character.toChars(cp))
        assert(TextNorm.isWordCp(cp) === p.matcher(s).matches(), f"cp=U+$cp%04X")
      }
    }
    for (cp <- Seq(0x10400, 0x1D400, 0x1F600, 0x20000)) { // supplementary
      val s = new String(Character.toChars(cp))
      assert(TextNorm.isWordCp(cp) === p.matcher(s).matches(), f"cp=U+$cp%05X")
    }
  }
}

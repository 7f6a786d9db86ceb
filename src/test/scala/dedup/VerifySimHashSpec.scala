package dedup

import org.scalatest.funsuite.AnyFunSuite

class VerifySimHashSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("jaccardCounts: sorted-merge intersection/union") {
    assert(VerifyPairs.jaccardCounts(Array(1, 2, 3), Array(2, 3, 4)) === (2, 4))
    assert(VerifyPairs.jaccardCounts(Array.emptyIntArray, Array(1)) === (0, 1))
    assert(VerifyPairs.jaccardCounts(Array(1, 2), Array(1, 2)) === (2, 2))
    assert(VerifyPairs.jaccardCounts(Array(-5, 1), Array(-5, 7)) === (1, 3))
  }

  test("verifyJaccard keeps only pairs at/above threshold; integer-exact at 0.7") {
    import spark.implicits._
    val sh = Seq(
      DocShingles(1L, Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)),
      DocShingles(2L, Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 11)), // inter 9 / uni 11 = 0.818
      DocShingles(3L, Array(1, 2, 3, 4, 5, 6, 7, 20, 21, 22)), // inter 7 / uni 13 = 0.538
      DocShingles(4L, Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14))) // 10/14: 0.714 >= 0.7
      .toDS()
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val verified = VerifyPairs.verifyJaccard(edges, sh, 0.7)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(verified === Set((2L, 1L), (4L, 1L)))
    // exact boundary: inter*10 >= uni*7 — 7/10 passes at exactly 0.7
    val shB = Seq(
      DocShingles(10L, Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)),
      DocShingles(11L, Array(1, 2, 3, 4, 5, 6, 7, 11, 12, 13))).toDS()
    // inter=7 uni=13 -> 0.538 no; need inter=7, uni=10: subset case
    val shC = Seq(
      DocShingles(10L, Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)),
      DocShingles(11L, Array(1, 2, 3, 4, 5, 6, 7))).toDS()
    val vC = VerifyPairs.verifyJaccard(Seq((11L, 10L)).toDF("src", "dst"), shC, 0.7).count()
    assert(vC === 1L)
  }

  test("simhash64: identical sets equal; near sets near in hamming") {
    val base = (0 until 300).map(i => Hashes.xxh32Str(s"sh-$i")).toArray.distinct.sorted
    val near = (base.take(295) ++ (0 until 5).map(i => Hashes.xxh32Str(s"x-$i"))).distinct.sorted
    val far = (0 until 300).map(i => Hashes.xxh32Str(s"other-$i")).toArray.distinct.sorted
    val f1 = SimHash.simhash64(base, 42L)
    val f2 = SimHash.simhash64(base, 42L)
    val f3 = SimHash.simhash64(near, 42L)
    val f4 = SimHash.simhash64(far, 42L)
    assert(f1 === f2)
    assert(java.lang.Long.bitCount(f1 ^ f3) < 10)
    assert(java.lang.Long.bitCount(f1 ^ f4) > 15)
  }

  test("simhash banded candidates + hamming verify find near-identical docs") {
    import spark.implicits._
    val cfg = DedupConfig(ngram = 3, minLength = 3, hammingK = 3, saltBuckets = 4)
    // SimHash needs many shingles for the bit votes to stabilize: 400-token
    // docs differing in 1 token -> hamming ~0-2; a distinct doc -> ~32
    def words(seed: Int, n: Int) =
      (0 until n).map(i => s"w${Hashes.xxh32Str(s"$seed-$i") & 0xFFFF}").mkString(" ")
    val base = words(1, 400)
    val near = base.replace(base.split(" ")(200), "changedword")
    val docs = Seq(
      (1L, base),
      (2L, near),
      (3L, words(9, 300)))
      .toDF("id", "text")
    val sh = Lsh.shingleSets(docs, cfg)
    val edges = SimHash.verifiedEdges(sh, cfg)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(edges.contains((2L, 1L)))
    assert(!edges.exists(e => e._1 == 3L || e._2 == 3L))
  }

  test("hamming verify blocks guarantee: pairs within k share a block") {
    // construct fingerprints differing in exactly k=3 bits
    val fp1 = 0x0123456789ABCDEFL
    val fp2 = fp1 ^ 0x8000000000000001L ^ 0x0000000100000000L // 3 bits flipped
    assert(java.lang.Long.bitCount(fp1 ^ fp2) === 3)
    val blocks = 4
    val width = 64 / blocks
    val shared = (0 until blocks).exists { b =>
      ((fp1 >>> (b * width)) & 0xFFFF) == ((fp2 >>> (b * width)) & 0xFFFF)
    }
    assert(shared)
  }
}

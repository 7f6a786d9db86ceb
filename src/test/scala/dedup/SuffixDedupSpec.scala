package dedup

import org.scalatest.funsuite.AnyFunSuite

class SuffixDedupSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("longestCommonRun unit vectors") {
    assert(SuffixDedup.longestCommonRun("", "abc") === 0)
    assert(SuffixDedup.longestCommonRun("abc", "abc") === 3)
    assert(SuffixDedup.longestCommonRun("xxabcyy", "zzabcqq") === 3)
    assert(SuffixDedup.longestCommonRun("abcdef", "defabc") === 3)
    assert(SuffixDedup.longestCommonRun("abc", "xyz") === 0)
    val shared = "s" * 150
    assert(SuffixDedup.longestCommonRun("AA" + shared + "BB", "CC" + shared + "DD") === 150)
  }

  test("winnowing guarantee: docs sharing a >=minRun run share an anchor (property)") {
    val rnd = new scala.util.Random(11)
    def randStr(n: Int) = new String(Array.fill(n)(('a' + rnd.nextInt(26)).toChar))
    val minRun = 120
    for (_ <- 1 to 20) {
      val shared = randStr(minRun + rnd.nextInt(80))
      val a = randStr(rnd.nextInt(200)) + shared + randStr(rnd.nextInt(200))
      val b = randStr(rnd.nextInt(200)) + shared + randStr(rnd.nextInt(200))
      val aa = SuffixDedup.anchors(a, minRun).toSet
      val ab = SuffixDedup.anchors(b, minRun).toSet
      assert(aa.intersect(ab).nonEmpty, s"no shared anchor for run of len ${shared.length}")
    }
  }

  test("docs shorter than minRun emit no anchors") {
    assert(SuffixDedup.anchors("short text", 120).isEmpty)
  }

  test("verifiedEdges: finds the pair with a long shared run, skips others") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    def randStr(n: Int) = new String(Array.fill(n)(('a' + rnd.nextInt(26)).toChar))
    val shared = randStr(250)
    val docs = Seq(
      (1L, randStr(100) + shared + randStr(50)),
      (2L, randStr(80) + shared + randStr(90)),
      (3L, randStr(400)),
      (4L, randStr(30))) // too short to anchor
      .toDF("id", "text")
    val cfg = DedupConfig(suffixMinRun = 200, saltBuckets = 4)
    val edges = SuffixDedup.verifiedEdges(docs, cfg)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(edges === Set((2L, 1L)))
  }
}

package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

class SuffixRemoveSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val cfg = DedupConfig(idCol = "id", textCol = "text",
    suffixMinRun = 120, saltBuckets = 1, allPairsCap = 1 << 20)

  /** Deterministic pseudo-random letters (no shared substrings by chance). */
  private def rndText(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  test("coveredIntervals equals the brute-force per-position truth") {
    val l = 8
    val block = rndText(1, 30)
    val a = rndText(2, 50) + block + rndText(3, 40)
    val b = rndText(4, 20) + block + rndText(5, 15) + block.take(12) + rndText(6, 25)
    val got = SuffixDedup.coveredIntervals(a, b, l)
    // brute truth: position p covered iff some l-gram window [q, q+l) with
    // q <= p < q+l has b.substring(q, q+l) occurring in a
    val covered = (0 until b.length).filter { p =>
      (math.max(0, p - l + 1) to math.min(p, b.length - l)).exists { q =>
        a.contains(b.substring(q, q + l))
      }
    }.toSet
    val gotSet = got.flatMap { case (s, e) => s until e }.toSet
    assert(gotSet === covered)
    // disjoint, sorted intervals
    assert(got.sliding(2).forall(w => w.length < 2 || w(0)._2 < w(1)._1))
  }

  test("coveredIntervals: no match, short strings, full-cover") {
    assert(SuffixDedup.coveredIntervals(rndText(7, 100), rndText(8, 100), 10).isEmpty)
    assert(SuffixDedup.coveredIntervals("abc", "abcdef", 5).isEmpty)
    assert(SuffixDedup.coveredIntervals(null, "x", 2).isEmpty)
    val t = rndText(9, 60)
    assert(SuffixDedup.coveredIntervals(t, t, 10).toSeq === Seq((0, 60)))
  }

  test("removeRuns cuts the shared block from larger-id docs only") {
    // digit boundary sentinels make the maximal shared run EXACTLY the
    // block (letter-only rndText cannot extend a run across a digit pair)
    val block = rndText(10, 150) // ≥ minRun chars
    val d0 = rndText(11, 200) + "0" + block + "1" + rndText(12, 100)
    val d1 = rndText(13, 80) + "2" + block + "3" + rndText(14, 90)
    val d2 = rndText(15, 300) // untouched
    val docs = Seq((0L, d0), (1L, d1), (2L, d2)).toDF("id", "text")
    val got = SuffixDedup.removeRuns(docs, cfg)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got(0) === ((0L, d0, 0L)))               // earliest occurrence kept
    assert(got(1)._3 === 150L)                      // the block is cut from d1
    assert(got(1)._2 === rndText(13, 80) + "2" + "3" + rndText(14, 90))
    assert(got(2) === ((2L, d2, 0L)))
    // conservation: clean length + removed == original length
    got.zip(Seq(d0, d1, d2)).foreach { case ((_, clean, rm), orig) =>
      assert(clean.length + rm === orig.length)
    }
  }

  test("removeRuns: three-way share removes from both later docs, against originals") {
    val block = rndText(20, 130)
    val d0 = rndText(21, 50) + "0" + block + "1" + rndText(22, 50)
    val d1 = rndText(23, 60) + "2" + block + "3" + rndText(24, 60)
    val d2 = rndText(25, 70) + "4" + block + "5" + rndText(26, 70)
    val docs = Seq((0L, d0), (1L, d1), (2L, d2)).toDF("id", "text")
    val got = SuffixDedup.removeRuns(docs, cfg)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got(0)._3 === 0L)
    assert(got(1)._3 === 130L && got(2)._3 === 130L)
  }

  test("removeRuns: runs shorter than minRun are not cut; salted config equals exact") {
    val short = rndText(30, 80) // < 120 chars shared
    val d0 = rndText(31, 100) + short + rndText(32, 100)
    val d1 = rndText(33, 100) + short + rndText(34, 100)
    val docs = Seq((0L, d0), (1L, d1)).toDF("id", "text")
    val got = SuffixDedup.removeRuns(docs, cfg).as[(Long, String, Long)].collect()
    assert(got.forall(_._3 === 0L))
    // salted production topology on a corpus with real cuts
    val block = rndText(40, 140)
    val docs2 = (0L to 9L).map(i => (i, rndText(50 + i.toInt, 100) + block))
      .toDF("id", "text").repartition(7)
    val exact = SuffixDedup.removeRuns(docs2, cfg)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val salted = SuffixDedup.removeRuns(docs2,
        cfg.copy(saltBuckets = 4, allPairsCap = 0, chainEdges = true))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(exact.head._3 === 0L && exact.tail.forall(_._3 === 140L))
    assert(salted === exact)
  }

  test("removeRuns passes null and sub-anchor-length texts through") {
    val docs = Seq((0L, null.asInstanceOf[String]), (1L, "tiny"), (2L, rndText(60, 500)))
      .toDF("id", "text")
    val got = SuffixDedup.removeRuns(docs, cfg)
      .select(col("id"), col("text_clean"), col("n_removed"))
      .as[(Long, Option[String], Long)].collect().sortBy(_._1)
    assert(got(0) === ((0L, None, 0L)))
    assert(got(1) === ((1L, Some("tiny"), 0L)))
    assert(got(2)._3 === 0L)
  }
}



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

  test("cross-salt-group recall: a shared ≥minRun run between docs salted into " +
      "DIFFERENT groups of their anchor bucket is found via the phase-2 rep bridge") {
    // The SCALE.md recall argument for the salted suffix topology: salting
    // splits an anchor bucket's members into salt groups, and two docs
    // sharing a run can land in different groups — each then being its own
    // group-min, connected only by Lsh.groupEdges PHASE 2 (group reps →
    // bucket min). This test constructs that situation EXACTLY (ids chosen
    // by their actual pmod(xxhash64(id), salt) values, not by luck) and
    // asserts the verified edge still appears — the guarantee is the
    // bridge, not same-group co-residence.
    import spark.implicits._
    val saltBuckets = 8
    val salts = spark.range(200)
      .select(col("id"),
        pmod(xxhash64(col("id")), lit(saltBuckets.toLong)).as("salt"))
      .as[(Long, Long)].collect().toMap
    val idA = 0L
    val idB = (1L to 199L).find(i => salts(i) != salts(idA)).get
    val rnd = new scala.util.Random(7)
    def blob(n: Int) = new String(Array.fill(n)(('a' + rnd.nextInt(26)).toChar))
    val shared = blob(150)
    val docs = (Seq(
      (idA, blob(300) + shared + blob(100)),
      (idB, blob(250) + shared + blob(150))) ++
      (500L until 520L).map(i => (i, blob(600)))).toDF("id", "text")
    val cfg = DedupConfig(idCol = "id", textCol = "text",
      suffixMinRun = 120, saltBuckets = saltBuckets)
    val edges = SuffixDedup.verifiedEdges(docs, cfg)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(salts(idA) !== salts(idB), "test precondition: different salt groups")
    assert(edges.contains((math.max(idA, idB), math.min(idA, idB))),
      s"cross-salt-group pair ($idA, $idB) lost; edges=$edges")
    // and nothing spurious: every verified edge involves only the pair
    assert(edges.forall { case (s, d) => Set(idA, idB)(s) && Set(idA, idB)(d) },
      s"spurious verified edges: $edges")
  }
}

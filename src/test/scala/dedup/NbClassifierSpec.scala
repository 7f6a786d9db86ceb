package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** NB classifier: bit-weight math golden vectors, train/score round trip
  * on a hand-computable corpus, OOV/null handling, clamp/guard behavior,
  * and the zero-shuffle scoring-plan assertion. */
class NbClassifierSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("bitLen matches length(bin(x)) semantics") {
    assert(NbClassifier.bitLen(1L) === 1L)
    assert(NbClassifier.bitLen(2L) === 2L)
    assert(NbClassifier.bitLen(3L) === 2L)
    assert(NbClassifier.bitLen(4L) === 3L)
    assert(NbClassifier.bitLen(1L << 40) === 41L)
    assert(NbClassifier.bitLen((1L << 40) - 1) === 40L)
  }

  test("tokenWeight golden values and guards") {
    // cPos=3, cNeg=0, tpv=tnv=10: w = bitLen(4*2^40/10) - bitLen(1*2^40/10)
    val s = 1L << 40
    val expected = NbClassifier.bitLen(4 * s / 10) - NbClassifier.bitLen(s / 10)
    assert(NbClassifier.tokenWeight(3, 0, 10, 10) === expected)
    assert(expected === 2L) // log2(4) exactly, same totals cancel
    // symmetric counts cancel exactly
    assert(NbClassifier.tokenWeight(7, 7, 100, 100) === 0L)
    // count clamp: beyond 2^22 evidence saturates
    assert(NbClassifier.tokenWeight(1L << 30, 0, 1L << 31, 1L << 31) ===
      NbClassifier.tokenWeight((1L << 22) - 1, 0, 1L << 31, 1L << 31))
    // max(1,...) guard: gigantic totals degrade to 0, never throw
    assert(NbClassifier.tokenWeight(0, 0, Long.MaxValue / 2, Long.MaxValue / 2) === 0L)
  }

  test("train+score separates a planted two-vocabulary corpus") {
    // pos docs speak {aa bb}, neg docs speak {cc dd}, both share {zz}
    val docs = (0 until 40).map { i =>
      val pos = i % 2 == 0
      val t = if (pos) "aa bb aa zz" else "cc dd cc zz"
      (i.toLong, t, pos)
    }.toDF("id", "text", "pos")
    val m = NbClassifier.train(docs, "text", "pos")
    val out = NbClassifier.score(docs, "id", "text", m)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.length === 40)
    out.foreach { case (id, nTok, score, pred) =>
      assert(nTok === 4L)
      assert(pred === (id % 2 == 0), s"doc $id score $score")
    }
    // shared token zz carries ~zero weight; class tokens carry the signal
    val zzW = {
      val j = java.util.Arrays.binarySearch(m.hashes, Hashes.xxh64Str("zz"))
      assert(j >= 0); m.weights(j)
    }
    val aaW = {
      val j = java.util.Arrays.binarySearch(m.hashes, Hashes.xxh64Str("aa"))
      assert(j >= 0); m.weights(j)
    }
    assert(math.abs(zzW) <= 1L)
    assert(aaW > zzW)
  }

  test("OOV tokens get the c=0 weight; null/empty text scores 0") {
    val docs = Seq((1L, "aa aa", true), (2L, "bb bb", false)).toDF("id", "text", "pos")
    val m = NbClassifier.train(docs, "text", "pos")
    val scored = NbClassifier.score(
      Seq((9L, "unseen tokens here"), (10L, null.asInstanceOf[String]),
        (11L, "")).toDF("id", "text"), "id", "text", m)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(scored(0) === ((9L, 3L, 3 * m.oov, 3 * m.oov > 0)))
    assert(scored(1) === ((10L, 0L, 0L, false)))
    assert(scored(2) === ((11L, 0L, 0L, false)))
  }

  test("vocabK bounds the model; spilled tokens score as OOV") {
    val docs = Seq((1L, "aa aa aa bb bb cc", true), (2L, "dd", false))
      .toDF("id", "text", "pos")
    val m = NbClassifier.train(docs, "text", "pos", vocabK = 2)
    assert(m.hashes.length === 2) // aa (3) and bb (2); cc/dd spill
    assert(java.util.Arrays.binarySearch(m.hashes, Hashes.xxh64Str("cc")) < 0)
  }

  test("training is partition-layout invariant") {
    val rows = (0 until 300).map { i =>
      val pos = i % 3 == 0
      val t = (0 until 20).map(k =>
        if ((i * 31 + k * 7) % 5 < (if (pos) 3 else 1)) s"p${k % 6}" else s"n${k % 7}")
        .mkString(" ")
      (i.toLong, t, pos)
    }
    val m1 = NbClassifier.train(
      rows.toDF("id", "text", "pos").repartition(1), "text", "pos")
    val m13 = NbClassifier.train(
      rows.toDF("id", "text", "pos").repartition(13), "text", "pos")
    assert(m1.hashes.toSeq === m13.hashes.toSeq)
    assert(m1.weights.toSeq === m13.weights.toSeq)
    assert(m1.oov === m13.oov)
  }

  test("scoring plan is zero-shuffle") {
    val docs = Seq((1L, "aa", true)).toDF("id", "text", "pos")
    val m = NbClassifier.train(docs, "text", "pos")
    val plan = NbClassifier.score(docs, "id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"score must not shuffle:\n$plan")
  }
}

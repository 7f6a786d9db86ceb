package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

class AuditSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private val cfg = DedupConfig(numPerm = 64, threshold = 0.7, minLength = 3)

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("identical docs: jaccard 1.0, every band shared, hamming 0") {
    val r = Audit.explainPair(
      docs(1L -> "the quick brown fox jumps over the lazy dog",
           2L -> "the quick brown fox jumps over the lazy dog"), 1L, 2L, cfg)
    assert(r.jaccardPermille === 1000 && r.aboveThreshold)
    assert(r.inter === r.uni)
    assert(r.sharedBands === r.totalBands)
    assert(r.hamming === 0)
    assert(Audit.render(r).contains("jaccard=1.000"))
  }

  test("unrelated docs: low jaccard, no shared bands, large hamming") {
    val r = Audit.explainPair(
      docs(1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
           2L -> "one two three four five six seven eight nine ten"), 1L, 2L, cfg)
    assert(r.jaccardPermille === 0 && !r.aboveThreshold)
    assert(r.sharedBands === 0)
    assert(r.hamming > 10)
  }

  test("report numbers are ENGINE-true: match direct primitive calls") {
    val ta = "shared prefix words here then something unique alpha beta gamma"
    val tb = "shared prefix words here then something unique delta epsilon zeta"
    val r = Audit.explainPair(docs(5L -> ta, 9L -> tb), 9L, 5L, cfg) // order-free
    assert(r.idA === 5L && r.idB === 9L)
    val sa = TextNorm.shingleHashes(ta, cfg.ngram, cfg.minLength)
    val sb = TextNorm.shingleHashes(tb, cfg.ngram, cfg.minLength)
    val (i, u) = VerifyPairs.jaccardCounts(sa, sb)
    assert(r.inter === i && r.uni === u)
    assert(r.jaccardPermille === (i.toLong * 1000 / u).toInt)
    assert(r.hamming === java.lang.Long.bitCount(
      SimHash.simhash64(sa, cfg.seed) ^ SimHash.simhash64(sb, cfg.seed)))
  }

  test("--explain-pair CLI flag parses (whitespace-tolerant, no --output needed)") {
    val a = Pipeline.parse(Array("--synth", "10", "--explain-pair", "5, 9"))
    assert(a.explainPair === Some((5L, 9L)))
    // malformed forms fail with the format hint, not a MatchError
    for (bad <- Seq("5", "1,2,3", "a,b")) {
      val e = intercept[IllegalArgumentException] {
        Pipeline.parse(Array("--synth", "10", "--explain-pair", bad))
      }
      assert(e.getMessage.contains("a,b"), s"input '$bad': ${e.getMessage}")
    }
  }

  test("missing or below-min-length docs fail loudly, naming the eligible ids") {
    val d = docs(1L -> "plenty of words in this one to pass the gate",
                 2L -> "too short")
    val e1 = intercept[IllegalArgumentException] {
      Audit.explainPair(d, 1L, 2L, cfg) // 2 fails minLength
    }
    assert(e1.getMessage.contains("eligible ids found: 1"))
    intercept[IllegalArgumentException] { Audit.explainPair(d, 1L, 99L, cfg) }
    intercept[IllegalArgumentException] { Audit.explainPair(d, 1L, 1L, cfg) }
  }

  test("explainVecPair: engine-true cosine, buckets, and reachability verdict") {
    import spark.implicits._
    def v(seed: Long): Array[Float] = Array.tabulate(16) { d =>
      val h = Hashes.xxh64Long(seed * 313 + d, 5L)
      (((h >>> 22) & 0xFFFF).toFloat / 65535f) - 0.5f
    }
    val a = v(1)
    val near = Array.tabulate(16)(d => a(d) + 0.005f * v(99)(d))
    val far = v(777)
    val vecs = Seq((1L, a), (2L, near), (3L, far), (4L, a.map(_ => 0f)))
      .toDF("id", "vec")
    val rNear = Audit.explainVecPair(vecs, 1L, 2L, 0.95, dim = 16, nbits = 8)
    assert(rNear.aboveThreshold && rNear.cosine > 0.99)
    assert(rNear.reachable, "near-identical pair must be within probe radius")
    // report agrees with the engine's own bucketing
    val buckets = Ann.signBuckets(vecs.where(col("id").isin(1L, 2L)), 16, 8, 42L)
      .as[(Long, Long)].collect().toMap
    assert(rNear.bucketA === buckets(1L) && rNear.bucketB === buckets(2L))
    assert(rNear.bucketHamming ===
      java.lang.Long.bitCount(buckets(1L) ^ buckets(2L)))
    val rFar = Audit.explainVecPair(vecs, 1L, 3L, 0.95, dim = 16, nbits = 8)
    assert(!rFar.aboveThreshold)
    // zero vector: cosine undefined -> -1, never above threshold
    val rZero = Audit.explainVecPair(vecs, 1L, 4L, 0.95, dim = 16, nbits = 8)
    assert(rZero.cosine === -1.0 && !rZero.aboveThreshold)
    intercept[IllegalArgumentException] {
      Audit.explainVecPair(vecs, 1L, 99L, 0.95, dim = 16)
    }
    assert(Audit.render(rNear).contains("reachable"))
  }
}

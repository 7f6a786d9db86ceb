package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** ANN scale paths: probe-set math, bounded top-k aggregation, IVF parity
  * with brute force, and LSH recall gates on a PLANTED high-cosine corpus
  * (the driver's embeddings table has no cosine≥0.95 structure — measured
  * max pairwise cosine ≈ 0.5 — so the recall evidence lives here). */
class AnnSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def vec(seed: Long, dim: Int): Array[Float] =
    Array.tabulate(dim) { d =>
      val h = Hashes.xxh64Long(seed * 4096 + d, 99L)
      (((h >>> 16) & 0xFFFF).toFloat / 65535f) - 0.5f
    }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0; var d = 0
    while (d < a.length) {
      dp += a(d).toDouble * b(d); na += a(d).toDouble * a(d); nb += b(d).toDouble * b(d); d += 1
    }
    dp / math.sqrt(na * nb)
  }

  /** 30 clusters × 5 near-identical members (cosine ≥ ~0.99 intra) + 150
    * singletons. */
  private def planted(dim: Int = 32): Seq[(Long, Array[Float])] = {
    val clustered = (0 until 150).map { i =>
      val c = i / 5
      val base = vec(c.toLong, dim)
      val noise = vec(10000L + i, dim)
      (i.toLong, Array.tabulate(dim)(d => base(d) + 0.02f * noise(d)))
    }
    val singles = (150 until 300).map(i => (i.toLong, vec(20000L + i, dim)))
    clustered ++ singles
  }

  test("DotF32 codegen expression == HOF aggregate(zip_with) oracle, and null-propagates") {
    import spark.implicits._
    val rows = (0 until 50).map(i => (i.toLong, vec(i.toLong, 32), vec(1000L + i, 32))) :+
      ((50L, null.asInstanceOf[Array[Float]], vec(9L, 32)))
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"), Ann.dot(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val want = df.select(col("id"), Ann.dotHof(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(50L) == null)
    (0 until 50).foreach { i =>
      val (g, w) = (got(i.toLong).asInstanceOf[Double], want(i.toLong).asInstanceOf[Double])
      assert(math.abs(g - w) < 1e-9, s"row $i: $g vs $w")
    }
  }

  test("probeSet: sizes and hamming radius") {
    val p0 = Ann.probeSet(0x5AL, 8, 0)
    val p1 = Ann.probeSet(0x5AL, 8, 1)
    val p2 = Ann.probeSet(0x5AL, 8, 2)
    assert(p0.toSeq === Seq(0x5AL))
    assert(p1.length === 9 && p1.distinct.length === 9)
    assert(p2.length === 1 + 8 + 28 && p2.distinct.length === 37)
    assert(p2.forall(b => java.lang.Long.bitCount(b ^ 0x5AL) <= 2))
  }

  test("bruteForceTopK: rank order is (sim desc, id asc) and k-bounded") {
    import spark.implicits._
    val vs = planted().take(60)
    val df = vs.toDF("id", "vec")
    val q = df.select(col("id").as("qid"), col("vec").as("qvec"))
    val got = Ann.bruteForceTopK(q, df, 3).collect()
    assert(got.groupBy(_.getLong(0)).forall(_._2.length <= 3))
    // oracle for one query
    val byId = vs.toMap
    val q0 = got.filter(_.getLong(0) == 0L).sortBy(_.getInt(1))
    val expect = vs.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosine(byId(0L), v)) }
      .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)
    assert(q0.map(_.getLong(2)).toSeq === expect.toSeq)
  }

  test("ivfTopK == bruteForceTopK restricted to cells") {
    import spark.implicits._
    val vs = planted().take(100)
    val withCell = vs.map { case (id, v) => (id, v, id % 7) }
    val df = withCell.toDF("id", "vec", "cell")
    val got = Ann.ivfTopK(df, "cell", 3)
      .select("qid", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val expect = withCell.flatMap { case (qid, qv, cell) =>
      withCell.filter(o => o._3 == cell && o._1 != qid)
        .map { case (id, v, _) => (id, cosine(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(3).zipWithIndex
        .map { case ((id, _), i) => (qid, i + 1, id) }
    }.toSet
    assert(got === expect)
  }

  test("lshTopK recall ≥ 0.95 vs brute force for queries with true near neighbors") {
    import spark.implicits._
    val df = planted().toDF("id", "vec")
    val q = df.select(col("id").as("qid"), col("vec").as("qvec"))
    // gate on the clustered queries (ids < 150): their true top-3 are
    // cluster-mates at cosine ≈ 0.99. Singleton queries' "nearest"
    // neighbors are random vectors (cosine ≈ 0.3) — no LSH family places
    // those in a shared bucket, and recall on them is not the ANN contract.
    val bf = Ann.bruteForceTopK(q, df, 3)
      .where(col("qid") < 150)
      .select("qid", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(df, dim = 32, k = 3, nbits = 8, seed = 42L, probeRadius = 2)
      .where(col("qid") < 150)
      .select("qid", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.95, s"lshTopK recall $recall")
  }

  test("cosineDedupLsh recovers the brute-force clusters at 0.95 (pair recall ≥ 0.95)") {
    import spark.implicits._
    val df = planted().toDF("id", "vec")
    def pairs(assign: Map[Long, Long]): Set[(Long, Long)] =
      assign.groupBy(_._2).values.flatMap { g =>
        val ids = g.keys.toSeq.sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
      }.toSet
    val bf = pairs(Ann.cosineDedupAssignments(df, 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val lsh = pairs(Ann.cosineDedupLsh(df, 0.95, dim = 32, nbits = 8, seed = 42L, probeRadius = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(bf.nonEmpty, "planted clusters must produce duplicate pairs")
    // precision is exact (every LSH edge is cosine-verified); recall gated
    assert((lsh -- bf).isEmpty, "verified LSH pairs must be true pairs")
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.95, s"cosineDedupLsh pair recall $recall")
  }

  test("bucket cap bounds candidate fan-out deterministically") {
    import spark.implicits._
    // 200 near-identical vectors -> one hot bucket; cap keeps the corpus
    // side at `cap` rows so candidates ≤ probes · cap per query
    val base = vec(5L, 32)
    val hot = (0 until 200).map { i =>
      val noise = vec(90000L + i, 32)
      (i.toLong, Array.tabulate(32)(d => base(d) + 0.01f * noise(d)))
    }
    val df = hot.toDF("id", "vec")
    val r1 = Ann.lshTopK(df, dim = 32, k = 3, nbits = 4, seed = 42L,
      probeRadius = 0, bucketCap = 16).collect()
    val r2 = Ann.lshTopK(df, dim = 32, k = 3, nbits = 4, seed = 42L,
      probeRadius = 0, bucketCap = 16).collect()
    assert(r1.map(_.toString).sorted.toSeq === r2.map(_.toString).sorted.toSeq)
    // every query still returns rows (queries are never capped away)
    assert(r1.map(_.getLong(0)).distinct.length === 200)
  }

  test("cosineDedupLsh: cap-evicted vectors keep their duplicate cluster (ADVICE r2 medium)") {
    import spark.implicits._
    // one hot bucket of 64 near-identical vectors, corpus side capped at 8:
    // 56 vectors survive only as probes. Under the old src<dst candidate
    // filter a max-id evicted vector could emit no surviving pair; with
    // least/greatest normalization every member must land in one component.
    val base = vec(7L, 32)
    val hot = (0 until 64).map { i =>
      val noise = vec(70000L + i, 32)
      (i.toLong, Array.tabulate(32)(d => base(d) + 0.005f * noise(d)))
    }
    val assign = Ann.cosineDedupLsh(hot.toDF("id", "vec"), threshold = 0.95,
      dim = 32, nbits = 4, seed = 42L, probeRadius = 1, bucketCap = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign.size === 64)
    assert(assign.values.toSet.size === 1,
      s"expected one duplicate cluster, got components ${assign.values.toSet}")
  }

  test("quantizeInt8: golden rounding, zero vector, scale column") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1.0f, -1.0f, 0.5f, -0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
      (3L, Array(-2.0f, 1.0f, 0.999f, -0.5f, 0.004f))).toDF("id", "vec")
    val out = Ann.quantizeInt8(rows)
      .as[(Long, Array[Byte], Double)].collect().sortBy(_._1)
    // id 1: m=1 → q = floor(v·127 + 0.5): 127, floor(-126.5)=-127,
    // floor(64.0)=64, floor(-31.25)=-32, 0
    assert(out(0)._2.toSeq === Seq[Byte](127, -127, 64, -32, 0))
    assert(out(0)._3 === 1.0)
    assert(out(1)._2.toSeq === Seq[Byte](0, 0, 0, 0, 0))
    assert(out(1)._3 === 0.0)
    // id 3: m=2 → 0.999/2·127+0.5 = 63.93… → 63; 0.004/2·127+0.5 = 0.754 → 0
    assert(out(2)._2.toSeq === Seq[Byte](-127, 64, 63, -32, 0))
    assert(out(2)._3 === 2.0)
  }

  test("int8TopK: exact integer dots, (dot desc, id asc) order, no self-pairs") {
    import spark.implicits._
    val vs = planted(32).map { case (id, v) => (id, v) }.toDF("id", "vec")
    val qz = Ann.quantizeInt8(vs)
    val q = qz.where(col("id") < 10).select(col("id").as("qid"), col("qvec"))
    val got = Ann.int8TopK(q, qz.select(col("id"), col("qvec")), 4)
      .as[(Long, Int, Long, Double)].collect()
    // brute-force oracle over the same quantized bytes
    val qb = qz.as[(Long, Array[Byte], Double)].collect()
      .map { case (id, b, _) => id -> b }.toMap
    def dotq(a: Array[Byte], b: Array[Byte]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i).toLong * b(i).toLong; i += 1 }; s
    }
    for (qid <- 0L until 10L) {
      val expect = qb.keys.filter(_ != qid).toSeq
        .map(id => (id, dotq(qb(qid), qb(id))))
        .sortBy { case (id, d) => (-d, id) }.take(4)
      val mine = got.filter(_._1 == qid).sortBy(_._2)
        .map(r => (r._3, r._4.toLong)).toSeq
      assert(mine === expect, s"qid=$qid")
    }
    assert(got.forall(r => r._1 != r._3))
    // int8 ranking approximates float cosine: the quantized top-1 of a
    // clustered query is one of its 4 true cluster mates
    val members = (0 until 5).map(_.toLong).toSet
    val top1 = got.filter(r => r._1 == 0L && r._2 == 1).head._3
    assert(members.contains(top1), s"top1 $top1 not in cluster of 0")
  }

  test("quantizeInt8: dequantization error bounded by half a step") {
    import spark.implicits._
    val vs = planted(32).toDF("id", "vec")
    val rows = Ann.quantizeInt8(vs).as[(Long, Array[Byte], Double)].collect()
    val orig = planted(32).toMap
    rows.foreach { case (id, q, m) =>
      val v = orig(id)
      if (m == 0.0) assert(v.forall(_ == 0f))
      else {
        var d = 0
        while (d < v.length) {
          val deq = q(d).toDouble * m / 127.0
          // |v − q·m/127| ≤ (m/127)/2 (floor(x+0.5) rounds to nearest,
          // ties up) plus float→double slack
          assert(math.abs(v(d).toDouble - deq) <= m / 254.0 + 1e-9,
            s"id=$id dim=$d v=${v(d)} deq=$deq m=$m")
          d += 1
        }
      }
    }
  }

  test("int8RerankTopK: generous shortlist recovers the exact float top-k") {
    import spark.implicits._
    val vs = planted(32).toDF("id", "vec")
    val reranked = Ann.int8RerankTopK(vs, col("id") < 20, k = 3, shortlist = 40)
      .select(col("qid"), col("rank"), col("neighbor_id"))
      .as[(Long, Int, Long)].collect().toSet
    val exact = Ann.bruteForceTopK(
        vs.where(col("id") < 20).select(col("id").as("qid"), col("vec").as("qvec")),
        vs.select(col("id"), col("vec")), 3)
      .select(col("qid"), col("rank"), col("neighbor_id"))
      .as[(Long, Int, Long)].collect().toSet
    assert(reranked === exact,
      "with shortlist >> k the composition must equal exact brute force")
    intercept[IllegalArgumentException] {
      Ann.int8RerankTopK(vs, col("id") < 20, k = 5, shortlist = 3)
    }
  }

  test("int8 shortlist recall curve: quantified, monotone, near-1 at 4k") {
    import spark.implicits._
    val vs = planted(32).toDF("id", "vec")
    val exact = Ann.bruteForceTopK(
        vs.where(col("id") < 30).select(col("id").as("qid"), col("vec").as("qvec")),
        vs.select(col("id"), col("vec")), 3)
      .select(col("qid"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    def recallAt(shortlist: Int): Double = {
      val got = Ann.int8RerankTopK(vs, col("id") < 30, k = 3, shortlist = shortlist)
        .select(col("qid"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      val hits = exact.map { case (q, t) => (t & got.getOrElse(q, Set.empty)).size }.sum
      hits.toDouble / exact.values.map(_.size).sum
    }
    val r3 = recallAt(3)
    val r12 = recallAt(12)
    assert(r12 >= r3, f"recall must not drop with a larger shortlist: $r3%.3f -> $r12%.3f")
    assert(r12 >= 0.95, f"shortlist=4k should recover >=95%% of the exact top-k, got $r12%.3f")
    assert(r3 >= 0.8, f"even shortlist=k keeps most of the top-k on this corpus, got $r3%.3f")
  }
}

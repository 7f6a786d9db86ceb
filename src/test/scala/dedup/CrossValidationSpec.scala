package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Cross-validation against INDEPENDENT implementations that ship with
  * Spark itself — a different codebase computing the same mathematical
  * objects, so agreement is evidence neither side shares a bug:
  *
  *   - [[ConnectedComponents]] (large-star/small-star + the executor-local
  *     union-find) vs GraphX's Pregel-based `connectedComponents()` —
  *     both label every vertex with the minimum vertex id of its
  *     component, so the outputs must match EXACTLY on any graph.
  *   - The MinHash-LSH + exact-verify pipeline vs spark.ml's
  *     `MinHashLSH.approxSimilarityJoin` — different hash family,
  *     different banding layout, same retrieval task (Jaccard ≥ 0.7
  *     pairs); both are scored against brute-force ground truth computed
  *     from the very shingle sets the engine hashes.
  */
class CrossValidationSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def graphxCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import org.apache.spark.graphx.Graph
    val rdd = spark.sparkContext.parallelize(edges, 4)
    Graph.fromEdgeTuples(rdd, defaultValue = 0)
      .connectedComponents()
      .vertices.collect().map { case (v, c) => (v: Long, c: Long) }.toMap
  }

  private def ourCC(edges: Seq[(Long, Long)], local: Boolean): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    val out = if (local) ConnectedComponents.runAdaptive(df) // small → union-find
              else ConnectedComponents.run(df)               // force the star loop
    out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("CC ≡ GraphX connectedComponents on random / chain / clique / star graphs") {
    val rnd = new scala.util.Random(7)
    // random sparse graphs over a scattered id space
    val topologies = Seq.tabulate(3) { t =>
      Seq.fill(400)((rnd.nextInt(3000).toLong * 7 + t, rnd.nextInt(3000).toLong * 7 + t))
        .filter { case (a, b) => a != b }
    } ++ Seq(
      // a chain: diameter-bound stress. Kept to 60 hops because GraphX's
      // Pregel CC needs O(diameter) supersteps (our star loop needs
      // O(log n) rounds — the 1000-hop case is covered in its own spec)
      (0L until 60L).map(i => (i * 11, (i + 1) * 11)),
      // disjoint cliques + isolated stars
      (for (c <- 0 until 10; i <- 0 until 8; j <- (i + 1) until 8)
        yield ((c * 100 + i).toLong, (c * 100 + j).toLong)) ++
        (1L to 50L).map(i => (5000L, 5000L + i))
    )
    for ((edges, k) <- topologies.zipWithIndex) {
      val expect = graphxCC(edges)
      assert(ourCC(edges, local = true) === expect, s"topology $k (union-find path)")
      assert(ourCC(edges, local = false) === expect, s"topology $k (star loop)")
    }
  }

  /** Deterministic corpus with planted near-duplicates at varied edit
    * rates, so ground truth straddles the 0.7 threshold. */
  private def corpus(seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Array.tabulate(200)(i => s"w${i}tok")
    var id = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    for (_ <- 0 until 60) {
      val len = 40 + rnd.nextInt(40)
      val base = Array.fill(len)(vocab(rnd.nextInt(vocab.length)))
      out += ((id, base.mkString(" "))); id += 1
      for (_ <- 0 until 1 + rnd.nextInt(2)) {
        val mut = base.clone()
        // 0-4 token edits; each kills up to 5 of ~len 5-gram shingles, so
        // the planted Jaccards straddle 0.7 (0-2 edits above, 3-4 below)
        val edits = rnd.nextInt(5)
        for (_ <- 0 until edits) mut(rnd.nextInt(len)) = vocab(rnd.nextInt(vocab.length))
        out += ((id, mut.mkString(" "))); id += 1
      }
    }
    out.toSeq
  }

  test("MinHash-LSH+verify vs spark.ml MinHashLSH: both retrieve the true ≥0.7 pairs") {
    import spark.implicits._
    val cfg = DedupConfig(numPerm = 250, threshold = 0.7, ngram = 5, minLength = 5)
    val docs = corpus(11L)
    // brute-force ground truth over the SAME shingle-hash sets the engine uses
    val sets = docs.map { case (i, t) =>
      i -> TextNorm.shingleHashes(t, cfg.ngram, cfg.minLength).toSet
    }.toMap
    def jacc(a: Set[Int], b: Set[Int]): Double =
      if (a.isEmpty && b.isEmpty) 0.0 else (a & b).size.toDouble / (a | b).size
    val ids = docs.map(_._1)
    val truthJ = (for {
      x <- ids; y <- ids if x < y
      j = jacc(sets(x), sets(y)) if j >= cfg.threshold
    } yield ((x, y), j)).toMap
    val truth = truthJ.keySet
    // the HIGH stratum: J ≥ 0.85, where the (25 bands × 10 rows) S-curve
    // promises ≥ 1-(1-0.85^10)^25 ≈ 0.996 per pair — the regime the
    // ≥0.99-recall contract speaks to. Pairs at J ≈ 0.70 are ~50/50 by
    // the SAME math in ANY MinHash-LSH at this config (reference
    // included); they are scored against the theoretical floor below.
    val truthHigh = truthJ.filter(_._2 >= 0.85).keySet
    assert(truth.size >= 30, s"fixture must plant enough true pairs, got ${truth.size}")
    assert(truthHigh.size >= 15, s"fixture needs high-sim pairs, got ${truthHigh.size}")
    assert(truth.size < ids.size * (ids.size - 1) / 4, "fixture must not be all-dup")

    // ours: banding → salted star edges → exact verify → CC
    val df = docs.toDF("id", "text")
    val res = FuzzyDedup.run(df, cfg)
    val verified = res.edges.collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet
    // precision exact by construction: every verified edge is a true pair
    assert(verified.forall { case (a, b) => jacc(sets(a), sets(b)) >= cfg.threshold },
      "verify stage must be integer-exact")
    val comp = res.assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ourRecallHigh = truthHigh.count { case (a, b) => comp(a) == comp(b) }
      .toDouble / truthHigh.size
    assert(ourRecallHigh >= 0.99, f"engine high-sim recall $ourRecallHigh%.4f < 0.99")
    // full-stratum hits must clear the S-curve's own expectation floor:
    // E[hits] = Σ 1-(1-J^r)^b, minus 3σ of the independent-pair binomial
    // (CC transitivity only ADDS hits, so this is a valid lower bound)
    val (b, r) = cfg.bandsRows
    val pDetect = truthJ.values.map(j => 1.0 - math.pow(1.0 - math.pow(j, r), b))
    val expect = pDetect.sum
    val sigma = math.sqrt(pDetect.map(p => p * (1 - p)).sum)
    val ourHits = truth.count { case (x, y) => comp(x) == comp(y) }
    assert(ourHits >= expect - 3 * sigma - 1e-9,
      f"engine hits $ourHits below S-curve floor ${expect - 3 * sigma}%.1f " +
        f"(E=$expect%.1f σ=$sigma%.2f over ${truth.size} pairs)")

    // spark.ml: binary shingle vectors, 25 hash tables, exact-distance join
    import org.apache.spark.ml.feature.MinHashLSH
    import org.apache.spark.ml.linalg.Vectors
    val dim = 1 << 20
    val feats = docs.map { case (i, _) =>
      val idx = sets(i).toArray.map(h => (h & (dim - 1))).distinct.sorted
      (i, Vectors.sparse(dim, idx, Array.fill(idx.length)(1.0)))
    }.toDF("id", "features")
    val model = new MinHashLSH().setNumHashTables(25).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes").fit(feats)
    val mlPairs = model.approxSimilarityJoin(feats, feats, 0.3 + 1e-12, "dist")
      .select(col("datasetA.id").as("a"), col("datasetB.id").as("b"))
      .where(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // spark.ml's 25 single-row tables have detection prob 1-(1-J)^25
    // (≈1.0 for every J ≥ 0.7) and an EXACT distance filter after — so
    // it should retrieve essentially all of truth, high and borderline
    val mlRecall = truth.count(mlPairs.contains).toDouble / truth.size
    assert(mlRecall >= 0.97, f"spark.ml recall $mlRecall%.4f < 0.97")
    // agreement: the independent implementation confirms (almost) every
    // pair our verify stage emitted
    val confirmed = (verified & mlPairs).size
    assert(confirmed >= (0.95 * verified.size).toInt,
      s"spark.ml confirms only $confirmed of ${verified.size} verified pairs")
  }
}

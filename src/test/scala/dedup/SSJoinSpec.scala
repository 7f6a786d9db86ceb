package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SSJoinSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  /** Brute-force ground truth: all-pairs exact (inter, uni) at threshold. */
  private def brute(tokSets: DataFrame, t: Double): Set[(Long, Long, Long, Long)] = {
    val num = math.round(t * 1000000L)
    val g = tokSets.select(col("id").cast("long").as("id"),
      array_distinct(col("toks")).as("g"))
    val a = g.select(col("id").as("id_a"), col("g").as("ga"))
    val b = g.select(col("id").as("id_b"), col("g").as("gb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .withColumn("uni", (size(col("ga")) + size(col("gb"))).cast("long") - col("inter"))
      .where(col("inter") * 1000000L >= lit(num) * col("uni"))
      .select("id_a", "id_b", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  private def got(tokSets: DataFrame, t: Double): Set[(Long, Long, Long, Long)] =
    SSJoin.pairs(tokSets, t)
      .select("id_a", "id_b", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect().toSet

  /** Deterministic word corpus: clusters of near-dups + unrelated noise.
    * Docs in cluster c share a base vocabulary and differ by a few
    * suffix words — a spread of true jaccards above and below any t. */
  private def corpus(n: Int, nClusters: Int = 7): DataFrame = {
    (0 until n).map { i =>
      val c = i % nClusters
      val base = (0 until 12).map(k => s"base${c}_$k")
      val extra = (0 until (i % 5)).map(k => s"extra${i}_$k")
      val stop = Seq("the", "and") // corpus-wide stopwords (hot tokens)
      (i.toLong, (base ++ extra ++ stop).toArray)
    }.toDF("id", "toks")
  }

  test("pairs == brute force at several thresholds (string tokens)") {
    val ts = corpus(60)
    for (t <- Seq(0.5, 0.7, 0.85, 0.999)) {
      val e = brute(ts, t)
      val g = got(ts, t)
      assert(g === e, s"threshold $t")
      if (t <= 0.7) assert(e.nonEmpty, s"threshold $t should have true pairs")
    }
  }

  test("pairs == brute force on int shingle-hash sets") {
    val docs = (0 until 40).map { i =>
      val words = (0 until 30).map(k => s"w${(i / 4) * 30 + k}") // 4-doc clusters
        .updated(i % 30, s"mut$i") // one mutated word each
      (i.toLong, words.mkString(" "))
    }.toDF("id", "text")
    val cfg = DedupConfig(ngram = 3, minLength = 3, threshold = 0.6, seed = 11)
    val ts = Lsh.shingleSets(docs, cfg).toDF()
      .select(col("id"), col("shingles").as("toks"))
    assert(got(ts, 0.6) === brute(ts, 0.6))
    assert(brute(ts, 0.6).nonEmpty)
  }

  test("corpus-wide stopword generates zero candidates beyond the true ones") {
    // every doc shares "the"/"and"; with df ordering those sort LAST and
    // never enter any prefix, so candidate volume tracks true clusters,
    // not n²/2
    val ts = corpus(140, nClusters = 14) // ≤ 14·C(10,2)=630 within-cluster
    val nCand = SSJoin.candidates(ts, 0.7).count()
    val allPairs = 140L * 139L / 2L
    assert(nCand < allPairs / 10, s"candidates $nCand vs all-pairs $allPairs")
    // and the candidate set is a superset of the true pairs
    val cand = SSJoin.candidates(ts, 0.7)
      .as[(Long, Long)].collect().toSet
    val truePairs = brute(ts, 0.7).map(p => (p._1, p._2))
    assert(truePairs.subsetOf(cand))
  }

  test("dfCap above the max prefix df changes nothing; tiny dfCap only drops pairs") {
    val ts = corpus(60)
    val base = SSJoin.candidates(ts, 0.7).as[(Long, Long)].collect().toSet
    val capped = SSJoin.candidates(ts, 0.7, dfCap = 1000L).as[(Long, Long)].collect().toSet
    assert(capped === base)
    val tiny = SSJoin.candidates(ts, 0.7, dfCap = 2L).as[(Long, Long)].collect().toSet
    assert(tiny.subsetOf(base))
  }

  test("assignments: exact recall-1.0 dedup equals brute-force clustering") {
    val docs = (0 until 48).map { i =>
      val words = (0 until 25).map(k => s"w${(i / 3) * 25 + k}")
        .updated(i % 25, s"mut$i")
      (i.toLong, words.mkString(" "))
    }.toDF("id", "text")
    val cfg = DedupConfig(ngram = 3, minLength = 3, threshold = 0.55, seed = 5)
    val ts = Lsh.shingleSets(docs, cfg).toDF()
      .select(col("id"), col("shingles").as("toks"))
    val edges = brute(ts, 0.55).toSeq
      .map(p => (math.max(p._1, p._2), math.min(p._1, p._2))).toDF("src", "dst")
    val expect = ConnectedComponents.assignAll(
      docs.select(col("id")),
      ConnectedComponents.runAdaptive(edges))
      .as[(Long, Long)].collect().toSet
    val gotA = SSJoin.assignments(docs, cfg).as[(Long, Long)].collect().toSet
    assert(gotA === expect)
    assert(expect.exists { case (id, comp) => id != comp }) // real clusters
  }

  test("no cartesian product anywhere in the pairs plan") {
    val ts = corpus(20)
    val plan = SSJoin.pairs(ts, 0.7).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"))
    assert(!plan.contains("BroadcastNestedLoop"))
  }

  /** Brute-force containment ground truth (ordered pairs, a != b). */
  private def bruteContain(tokSets: DataFrame, t: Double): Set[(Long, Long, Long, Long)] = {
    val num = math.round(t * 1000000L)
    val g = tokSets.select(col("id").cast("long").as("id"),
      array_distinct(col("toks")).as("g"))
    val a = g.select(col("id").as("id_a"), col("g").as("ga"))
    val b = g.select(col("id").as("id_b"), col("g").as("gb"))
    a.join(b, col("id_a") =!= col("id_b"))
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .withColumn("len_a", size(col("ga")).cast("long"))
      .where(col("inter") * 1000000L >= lit(num) * col("len_a"))
      .select("id_a", "id_b", "inter", "len_a")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("containmentPairs: asymmetric — quote inside a long page is found one way only") {
    val small = (0 until 8).map(k => s"quote$k")
    val big = small ++ (0 until 80).map(k => s"page$k")
    val ts = Seq(
      (1L, small.toArray),
      (2L, big.toArray),
      (3L, (0 until 40).map(k => s"other$k").toArray)).toDF("id", "toks")
    val gotC = SSJoin.containmentPairs(ts, 0.9)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(gotC === Set((1L, 2L, 8L, 8L))) // a=1 contained in b=2; never 2-in-1
    // ...and Jaccard misses it entirely at any useful threshold
    assert(got(ts, 0.5).isEmpty)
  }

  test("dropContained: subset chain and mutual containment resolve deterministically") {
    // 1 ⊂ 2 ⊂ 4; 3 unrelated; 5 == 6 (mutual containment, equal size)
    val w = (0 until 100).map(k => s"w$k")
    val ts = Seq(
      (1L, w.take(10).toArray),
      (2L, w.take(40).toArray),
      (4L, w.take(100).toArray),
      (3L, (0 until 30).map(k => s"z$k").toArray),
      (6L, (0 until 20).map(k => s"m$k").toArray),
      (5L, (0 until 20).map(k => s"m$k").toArray)).toDF("id", "toks")
    val kept = SSJoin.dropContained(ts, 0.9).as[Long].collect().toSet
    // 1 and 2 drop (contained in a larger doc); 6 drops (equal set, 5 < 6)
    assert(kept === Set(3L, 4L, 5L))
  }

  test("dropContained == brute-force drop rule on random corpora") {
    for (seed <- Seq(1, 2, 3); t <- Seq(0.8, 0.9)) {
      val rnd = new scala.util.Random(seed)
      val ts = (0 until 30).map { i =>
        val len = 5 + rnd.nextInt(25)
        (i.toLong, (0 until len).map(k => s"t${(k * (1 + i % 4)) % 40}").distinct.toArray)
      }.toDF("id", "toks")
      val pairs = bruteContain(ts, t)
      val lens = ts.select(col("id"), size(array_distinct(col("toks"))).cast("long").as("len"))
        .as[(Long, Long)].collect().toMap
      val expectDrop = pairs.collect {
        case (a, b, _, la) if lens(b) > la || (lens(b) == la && b < a) => a
      }
      val expectKept = lens.keySet -- expectDrop
      val kept = SSJoin.dropContained(ts, t).as[Long].collect().toSet
      assert(kept === expectKept, s"seed=$seed t=$t")
    }
  }

  test("containmentPairs == brute force across seeds and thresholds") {
    for (seed <- Seq(4, 5)) {
      val rnd = new scala.util.Random(seed)
      val pool = (0 until 30).map(k => s"p$k")
      val ts = (0 until 40).map { i =>
        (i.toLong, Array.fill(1 + rnd.nextInt(10))(pool(rnd.nextInt(pool.size))))
      }.toDF("id", "toks")
      for (t <- Seq(0.5, 0.8, 1.0)) {
        val e = bruteContain(ts, t)
        assert(SSJoin.containmentPairs(ts, t)
          .as[(Long, Long, Long, Long)].collect().toSet === e, s"seed $seed t $t")
        if (t <= 0.8) assert(e.nonEmpty)
      }
    }
  }

  test("containmentPairs dfCap: large cap is a no-op, tiny cap only loses pairs") {
    val ts = corpus(50)
    val base = SSJoin.containmentPairs(ts, 0.8).as[(Long, Long, Long, Long)].collect().toSet
    assert(SSJoin.containmentPairs(ts, 0.8, dfCap = 1000L)
      .as[(Long, Long, Long, Long)].collect().toSet === base)
    assert(SSJoin.containmentPairs(ts, 0.8, dfCap = 2L)
      .as[(Long, Long, Long, Long)].collect().toSet.subsetOf(base))
  }

  test("hot-token dfCap: candidate volume bounded, recall loss exactly the " +
      "all-hot-prefix docs, identical sets immune to the cap") {
    // (a) candidate-volume bound: 60 docs of 10 shared hot tokens + 1
    // unique token each — every PREFIX contains hot tokens, so uncapped
    // candidate volume is all-pairs; a cap below the hot df cuts it to 0
    val hotTs = (0 until 60).map { i =>
      (i.toLong, ((0 until 10).map(k => s"h$k") :+ s"u$i").toArray)
    }.toDF("id", "toks")
    val uncapped = SSJoin.candidates(hotTs, 0.7).count()
    val capped = SSJoin.candidates(hotTs, 0.7, dfCap = 10L).count()
    assert(uncapped === 60L * 59L / 2L, "all-hot prefixes generate all-pairs")
    assert(capped === 0L, "cap below hot df leaves only the unique tokens as keys")
    // (b) containment recall loss is EXACTLY the documented failure mode:
    // probe docs whose entire prefix is hotter than the cap — nothing else
    val hot = (0 until 4).map(k => s"h$k")
    val ts = (
      // rare-prefix true pairs: quote q_i (8 rare tokens) inside page p_i
      (0 until 10).flatMap { i =>
        val c = (0 until 8).map(k => s"c${i}_$k")
        Seq((100L + i, c.toArray),
          (200L + i, (c ++ (0 until 40).map(k => s"f${i}_$k")).toArray))
      } ++ Seq(
        // all-hot probe a1 ⊂ a2: a1's prefix is entirely hot tokens
        (1L, hot.toArray),
        (2L, (hot :+ "h_extra").toArray),
        // identical all-hot twins: found via collapse, not the token join
        (3L, (hot :+ "h5").toArray),
        (4L, (hot :+ "h5").toArray))
      ).toDF("id", "toks")
    def cp(cap: Long) = SSJoin.containmentPairs(ts, 0.9, cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val base = cp(0L)
    // df is counted over collapsed reps: h0..h3 appear in 3 reps (a1, a2,
    // the twins' single rep) > cap 2; rare tokens are at df ≤ 2
    val withCap = cp(2L)
    assert(base.contains((1L, 2L)) && base.contains((3L, 4L)) && base.contains((4L, 3L)))
    (0 until 10).foreach(i => assert(base.contains((100L + i, 200L + i))))
    // every lost pair has probe a1 — the one doc whose whole prefix is
    // hotter than the cap (it is 0.9-contained in a2 and in both twins)
    val lost = base -- withCap
    assert(lost === Set((1L, 2L), (1L, 3L), (1L, 4L)),
      s"cap must lose exactly the all-hot-prefix probe's pairs, lost=$lost")
    assert(withCap.contains((3L, 4L)) && withCap.contains((4L, 3L)),
      "identical sets survive any cap (collapse finds them, not the join)")
  }

  test("randomized corpora: pairs == brute force across seeds and thresholds") {
    // seeded-random token sets: mixed sizes, shared pools, singletons —
    // the adversarial surface for the prefix/length filters
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val pool = (0 until 40).map(k => s"p$k")
      val rows = (0 until 50).map { i =>
        val sz = 1 + rnd.nextInt(12)
        val toks = Array.fill(sz)(pool(rnd.nextInt(pool.size))) :+ s"own${rnd.nextInt(10)}"
        (i.toLong, toks)
      }
      val ts = rows.toDF("id", "toks")
      for (t <- Seq(0.4, 0.6, 0.8))
        assert(got(ts, t) === brute(ts, t), s"seed $seed threshold $t")
    }
  }

  test("pipeline --exact-join: same kept set as the LSH flagship on the synth corpus") {
    val dir = java.nio.file.Files.createTempDirectory("ssjoinpipe").toString
    val lsh = Pipeline.parse(Array("--synth", "600", "--output", s"$dir/lsh"))
    val exact = Pipeline.parse(Array("--synth", "600", "--output", s"$dir/xj", "--exact-join"))
    val (keptL, aL) = Pipeline.run(spark, lsh)
    val (keptX, aX) = Pipeline.run(spark, exact)
    // exact-join recall is a superset of LSH's; on the synth corpus LSH
    // already finds every planted pair, so the outputs coincide exactly
    assert(keptX.select("url").as[String].collect().sorted.toSeq ===
      keptL.select("url").as[String].collect().sorted.toSeq)
    assert(aX.as[(Long, Long)].collect().toSet === aL.as[(Long, Long)].collect().toSet)
    assert(keptX.count() < aX.count()) // dedup actually removed dups
    // the exact mode never computed a banding checkpoint
    assert(!new java.io.File(s"$dir/xj").listFiles.exists(_.getName == "bands"))
  }

  test("sub-token docs and singleton-token docs are handled") {
    val ts = Seq(
      (1L, Array("only")),
      (2L, Array("only")),
      (3L, Array.empty[String]),
      (4L, Array("lonely", "words", "here"))).toDF("id", "toks")
    assert(got(ts, 0.7) === Set((1L, 2L, 1L, 1L)))
  }

  test("containment dfCap recall on a stopword-heavy corpus: loss confined to " +
      "all-hot-prefix probes, measured recall ≥ planted floor") {
    // The pipeline's --contain default ships dfCap=100000 (Pipeline.Args).
    // This test runs the SAME mechanism at test scale (cap 40 against hot
    // df ≈ 47 and stopword df = 200) on a corpus built to quantify the
    // loss — the LshSpec hub-hazard methodology: plant pairs whose
    // survival/loss under the cap is provable, then MEASURE recall.
    //   - 100 quote⊂page pairs with rare-token prefixes (df 2 « cap):
    //     must all survive — a doc with ANY sub-cap token in its prefix
    //     keeps its candidates;
    //   - 5 probe⊂page pairs where the probe's ENTIRE prefix is hot
    //     group-tokens (df ≈ 47 > cap): the one documented failure mode —
    //     all 5 lost, nothing else;
    //   - 300 noise docs + corpus-wide stopwords make the hot tokens hot.
    // Planted recall floor: 100/105 ≈ 0.952. SCALE.md cites this number.
    val stop = (0 until 30).map(k => s"s$k")
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[String])]()
    (0 until 100).foreach { i =>
      val c = (0 until 10).map(k => s"c${i}_$k")
      rows += ((1000L + i, (c ++ stop).toArray)) // quote, prefix = rare c
      rows += ((2000L + i,
        (c ++ stop ++ (0 until 50).map(k => s"f${i}_$k")).toArray)) // page
    }
    (0 until 5).foreach { g =>
      val hot = (0 until 20).map(k => s"h${g}_$k")
      (0 until 60).foreach { n => // noise: 15-of-20 hot + unique filler
        rows += ((5000L + g * 100 + n,
          ((0 until 15).map(j => hot((n + j) % 20)) ++
            (0 until 30).map(k => s"n${g}_${n}_$k")).toArray))
      }
      rows += ((3000L + g, hot.toArray)) // probe: ALL-hot prefix
      rows += ((4000L + g,
        (hot ++ (0 until 40).map(k => s"pf${g}_$k")).toArray)) // its page
    }
    val ts = rows.toSeq.toDF("id", "toks")
    def cp(cap: Long) = SSJoin.containmentPairs(ts, 0.8, cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = cp(0L)
    val capped = cp(40L)
    // exactly the planted pairs, nothing accidental
    assert(exact.size === 105, s"planted corpus drifted: ${exact.size} exact pairs")
    assert(capped.subsetOf(exact), "a cap can only lose pairs, never invent them")
    (0 until 100).foreach(i => assert(capped.contains((1000L + i, 2000L + i)),
      s"rare-prefix pair $i lost under the cap"))
    val lost = exact -- capped
    assert(lost === (0 until 5).map(g => (3000L + g, 4000L + g)).toSet,
      s"loss not confined to all-hot-prefix probes: $lost")
    val recall = (exact.size - lost.size).toDouble / exact.size
    assert(recall >= 0.95, f"measured recall $recall%.4f under planted floor")
    info(f"dfCap recall on stopword-heavy corpus: ${exact.size - lost.size}/${exact.size} = $recall%.4f")
  }

  test("collapseExact: 100k-member hot identical-set group stays partial-agg-bounded (no window)") {
    // The web-scale hazard the r4 VERDICT named: the most common identical
    // token set (empty page, boilerplate template) can have 10^6-10^8
    // members. A Window.partitionBy(ktoks) would land EVERY member row,
    // with its token array, on one task; the groupBy form map-side-combines
    // to ≤1 row per distinct set per map task, so the hot group's reduce
    // fan-in is #map-partitions, not #members (and the members join-back
    // is an equi-join on the 8-byte hash key, which AQE can skew-split —
    // a window partition can never be split).
    val hotSet = Array("the", "boiler", "plate", "empty", "page")
    val nHot = 100000
    val hot = spark.range(nHot)
      .select(col("id"), typedLit(hotSet).as("toks"))
    val distincts = (0 until 10).map { i =>
      (1000000L + i, Array(s"uniq${i}_a", s"uniq${i}_b", s"uniq${i}_c"))
    }.toDF("id", "toks")
    val c = SSJoin.collapseExact(hot.union(distincts))

    // plan shape: no window anywhere in either output
    def plan(df: DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      out.toString
    }
    assert(!plan(c.reps).contains("Window"), "window in reps plan")
    assert(!plan(c.members).contains("Window"), "window in members plan")
    assert(plan(c.reps).contains("HashAggregate"), "no hash aggregate in reps plan")

    // per-task shuffle fan-in while computing the groups: with partial
    // aggregation the hot group contributes ≤ #map-partitions rows to its
    // reduce task. The old window shape would make one task read ~100k
    // records here — assert an order of magnitude under that.
    var maxTaskRecords = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) maxTaskRecords =
          math.max(maxTaskRecords, m.shuffleReadMetrics.recordsRead)
      }
    }
    // listener scoped to the GROUPS aggregation only: that is the stage
    // the window used to run (and where it concentrated all member rows).
    // The members join-back does read the full group per join task at
    // this toy scale — that is the part AQE skew-splits at real sizes,
    // which a 4-core test cannot demonstrate (byte thresholds).
    spark.sparkContext.addSparkListener(listener)
    val nReps =
      try {
        val r = c.reps.count()
        // listener events are async; wait for quiescence
        var last = -1L; var spins = 0
        while (last != maxTaskRecords && spins < 50) {
          last = maxTaskRecords; Thread.sleep(100); spins += 1
        }
        r
      } finally spark.sparkContext.removeSparkListener(listener)

    assert(nReps === 11L) // 1 hot set + 10 distinct sets
    assert(maxTaskRecords < 10000L,
      s"a task read $maxTaskRecords shuffle records — hot group not partial-agg-bounded")

    assert(c.members.count() === nHot + 10L)
    val hotGroup = c.members.where(col("gid") === 0L)
      .agg(count(lit(1)), min(col("id")), max(col("gcnt")), max(col("glen")))
      .as[(Long, Long, Long, Long)].collect().head
    assert(hotGroup === ((nHot.toLong, 0L, nHot.toLong, hotSet.length.toLong)))
  }
}

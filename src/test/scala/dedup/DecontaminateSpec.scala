package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // brute-force string-set oracle: distinct word n-grams as strings
  private def gramsOf(text: String, n: Int): Set[String] = {
    val t = TextNorm.tokenize(text)
    if (t.length < n) Set.empty
    else (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" ")).toSet
  }

  test("flag matches the brute-force string-gram oracle") {
    val bench = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("id", "text")
    val corpus = Seq(
      (10L, "he saw the quick brown fox jumps across"),       // 1 shared 5-gram? check oracle
      (11L, "totally unrelated content with no overlap here"),
      (12L, "prefix pack my box with five dozen liquor jugs suffix"), // contains whole bench doc
      (13L, "quick brown fox"),                                // < n tokens of overlap
      (14L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val n = 5
    val benchGrams = bench.as[(Long, String)].collect()
      .flatMap(r => gramsOf(r._2, n)).toSet
    val expected = corpus.as[(Long, String)].collect().map { case (id, t) =>
      val hits = if (t == null) 0L else gramsOf(t, n).count(benchGrams).toLong
      (id, hits, hits > 0)
    }.toSet

    val idx = Decontaminate.benchmarkIndex(bench, "text", n)
    val got = Decontaminate.flag(corpus, "text", idx, n)
      .select(col("doc_id"), col("n_hits"), col("contaminated"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === expected)
    // sanity: the full-containment doc is contaminated, the unrelated one is not
    assert(got.exists(r => r._1 == 12L && r._3))
    assert(got.exists(r => r._1 == 11L && !r._3))
  }

  test("docs shorter than n tokens are never contaminated") {
    val bench = Seq("a b c d e").toDF("text")
    val corpus = Seq((1L, "a b c d"), (2L, "a b c d e")).toDF("doc_id", "text")
    val idx = Decontaminate.benchmarkIndex(bench, "text", 5)
    val got = Decontaminate.flag(corpus, "text", idx, 5)
      .select(col("doc_id"), col("contaminated")).as[(Long, Boolean)]
      .collect().toMap
    assert(got === Map(1L -> false, 2L -> true))
  }

  test("n_hits counts DISTINCT contaminated grams (repeats count once)") {
    val bench = Seq("x y z w q").toDF("text")
    val corpus = Seq((1L, "x y z w q pad x y z w q")).toDF("doc_id", "text")
    val idx = Decontaminate.benchmarkIndex(bench, "text", 5)
    val hits = Decontaminate.flag(corpus, "text", idx, 5)
      .select(col("n_hits")).as[Long].head()
    assert(hits === 1L)
  }

  test("clean drops exactly the contaminated docs, payload intact") {
    val bench = Seq("alpha beta gamma delta epsilon").toDF("text")
    val corpus = Seq(
      (1L, "pre alpha beta gamma delta epsilon post", "en"),
      (2L, "clean document text here with words", "de")).toDF("doc_id", "text", "lang")
    val kept = Decontaminate.clean(corpus, bench, "text", 5)
    assert(kept.columns.toSeq === Seq("doc_id", "text", "lang"))
    assert(kept.as[(Long, String, String)].collect().map(_._1).toSeq === Seq(2L))
  }

  test("corpus side plans zero shuffles (single projection over the scan)") {
    val bench = Seq("a b c d e").toDF("text")
    val idx = Decontaminate.benchmarkIndex(bench, "text", 5)
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Decontaminate.flag(corpus, "text", idx, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), s"unexpected shuffle:\n$plan")
  }

  test("partition-layout invariance") {
    val bench = Seq("m n o p q", "r s t u v").toDF("text")
    val rows = (1L to 200L).map { i =>
      val t = if (i % 7 == 0) s"pad m n o p q tail $i" else s"doc $i words only here none"
      (i, t)
    }
    val idx = Decontaminate.benchmarkIndex(bench, "text", 5)
    val a = Decontaminate.flag(rows.toDF("doc_id", "text").repartition(1), "text", idx, 5)
      .select(col("doc_id"), col("n_hits")).as[(Long, Long)].collect().toSet
    val b = Decontaminate.flag(rows.toDF("doc_id", "text").repartition(13), "text", idx, 5)
      .select(col("doc_id"), col("n_hits")).as[(Long, Long)].collect().toSet
    assert(a === b)
    assert(a.count(_._2 > 0) === (1L to 200L).count(_ % 7 == 0))
  }

  test("overlapStats: integer fraction boundary, short docs, zero shuffle") {
    val bench = Seq("a b c d e f g h i j").toDF("text") // 6 distinct 5-grams
    val idx = Decontaminate.benchmarkIndex(bench, "text", 5)
    val corpus = Seq(
      // 6/6 grams contaminated → 100%
      (1L, "a b c d e f g h i j"),
      // own text w x y z v (1 gram) + whole bench appended: grams mixing
      // the junction are NOT in the index
      (2L, "w x y z v a b c d e f g h i j"),
      // exactly at the boundary: craft 50%: 1 bench gram of 2 total
      (3L, "a b c d e x"), // grams: "a b c d e"(hit), "b c d e x"(miss) → 50%
      (4L, "no overlap at all here present"),
      (5L, "tiny"), // < 5 tokens → 0 grams, keep
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Decontaminate.overlapStats(corpus, "text", idx, 5, 50)
      .select(col("doc_id"), col("n_grams"), col("n_hits"), col("keep"))
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 6L, 6L, false)))
    val (_, ng2, nh2, _) = out(1)
    assert(nh2 === 6L && ng2 === 11L) // 15 tokens → 11 grams, 6 bench hits
    assert(out(1)._4 === false)       // 6/11 > 50%
    assert(out(2) === ((3L, 2L, 1L, true)))  // exactly 50% → keep (≤)
    assert(out(3) === ((4L, 2L, 0L, true)))
    assert(out(4) === ((5L, 0L, 0L, true)))
    assert(out(5) === ((6L, 0L, 0L, true)))
    // maxPct 0: any hit kills; maxPct 100: nothing dies (n_hits ≤ n_grams)
    val strict = Decontaminate.overlapStats(corpus, "text", idx, 5, 0)
      .where(!col("keep")).select(col("doc_id")).as[Long].collect().sorted
    assert(strict.toSeq === Seq(1L, 2L, 3L))
    val lax = Decontaminate.overlapStats(corpus, "text", idx, 5, 100)
      .where(!col("keep")).count()
    assert(lax === 0L)
    val plan = Decontaminate.overlapStats(corpus, "text", idx, 5, 50)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), s"unexpected shuffle:\n$plan")
    // keep set grows monotonically with maxPct
    val keptAt = (0 to 100 by 25).map { pct =>
      Decontaminate.overlapStats(corpus, "text", idx, 5, pct)
        .where(col("keep")).select(col("doc_id")).as[Long].collect().toSet
    }
    keptAt.sliding(2).foreach {
      case Seq(lo, hi) => assert(lo.subsetOf(hi), "keep monotone in maxPct")
      case _ =>
    }
  }
}

package dedup

import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  /** The published worked example (Sennrich et al. 2016 §3.2 shape):
    * low×5 lower×2 newest×6 widest×3. First merges, hand-derived with the
    * deterministic (count desc, pair asc) tie-break:
    *   (e,s) 9 → (es,t) 9 → (est,</w>) 9 → (l,o) 7 → (lo,w) 7 */
  private val dict: Bpe.Dict = Array(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("learnMerges reproduces the hand-derived merge sequence") {
    val m = Bpe.learnMerges(dict, 5)
    assert(m.toSeq === Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord), ("l", "o"), ("lo", "w")))
  }

  /** Independent naive trainer: List[String]-based, recount-from-scratch,
    * different data structures and scan order than the engine. */
  private def naiveLearn(d: Bpe.Dict, n: Int): Seq[(String, String)] = {
    var words = d.map { case (w, c) =>
      (w.map(_.toString).toList :+ Bpe.EndOfWord, c)
    }.toList
    var out = List.empty[(String, String)]
    var k = 0
    var stop = false
    while (k < n && !stop) {
      val counts = words.flatMap { case (syms, c) =>
        syms.zip(syms.tail).map(p => (p, c))
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      if (counts.isEmpty || counts.values.max < 2) stop = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        out :+= best
        def merge(s: List[String]): List[String] = s match {
          case a :: b :: rest if (a, b) == best => (a + b) :: merge(rest)
          case a :: rest => a :: merge(rest)
          case Nil => Nil
        }
        words = words.map { case (syms, c) => (merge(syms), c) }
        k += 1
      }
    }
    out
  }

  test("learnMerges == independent naive implementation on random dicts") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 20) {
      val nWords = 3 + rnd.nextInt(12)
      val d: Bpe.Dict = Array.fill(nWords) {
        val len = 2 + rnd.nextInt(6)
        (Array.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString,
          1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }.toArray
      val n = 1 + rnd.nextInt(8)
      assert(Bpe.learnMerges(d, n).toSeq === naiveLearn(d, n), s"trial $trial dict ${d.toSeq}")
    }
  }

  test("encodeWord: rank-order apply reproduces the classic segmentation") {
    val ranks = Bpe.learnMerges(dict, 5).zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", ranks).toSeq === Seq("low", "est" + Bpe.EndOfWord))
    assert(Bpe.encodeWord("low", ranks).toSeq === Seq("low", Bpe.EndOfWord))
    // unseen chars stay as single symbols
    assert(Bpe.encodeWord("xyz", ranks).toSeq === Seq("x", "y", "z", Bpe.EndOfWord))
  }

  test("distributed fit + encode: wordCounts == local recount; token count " +
      "monotonically non-increasing in merge count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq(
      "low low low low low lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest")
    val df = texts.toDF("text").repartition(3)
    val wc = Bpe.wordCounts(df, "text", 100).toMap
    val local = texts.flatMap(_.split(" ")).groupBy(identity).view.mapValues(_.size.toLong)
    assert(wc === local.toMap)
    val merges = Bpe.fit(df, "text", 5, vocabK = 100)
    assert(merges.toSeq === Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord), ("l", "o"), ("lo", "w")))
    val doc = Seq("the lowest newest low").toDF("text")
    val counts = (0 to 5).map { k =>
      doc.select(Bpe.tokenCountCol(col("text"), merges.take(k)).as("n"))
        .collect()(0).getLong(0)
    }
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"token count not monotone: $counts")
    assert(counts.last < counts.head)
    // plan: encode is a zero-shuffle projection
    val plan = doc.select(Bpe.tokensCol(col("text"), merges).as("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ShardsSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def oracle(rows: Seq[(Long, Long)], budget: Long): Map[Long, (Long, Long)] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, w) =>
      val shard = acc / budget
      acc += w
      id -> (w, shard)
    }.toMap
  }

  test("assignByBudget equals the window-function oracle") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 400L).map(i => (i * 7 % 1009, 1L + rnd.nextInt(50).toLong))
      .distinctBy(_._1)
    val got = Shards.assignByBudget(rows.toDF("id", "w"), "id", col("w"), 100L)
      .as[(Long, Long, Long)].collect()
      .map { case (id, w, s) => id -> (w, s) }.toMap
    assert(got === oracle(rows, 100L))
  }

  test("matches sum() OVER (ORDER BY id) semantics exactly") {
    val rows = (1L to 300L).map(i => (i, (i % 13) + 1))
    val df = rows.toDF("id", "w")
    val win = df.withColumn(
      "shard",
      ((sum(col("w")).over(Window.orderBy(col("id"))) - col("w")) / lit(37L))
        .cast("long"))
      .select(col("id"), col("w"), col("shard"))
      .as[(Long, Long, Long)].collect().toSet
    val got = Shards.assignByBudget(df, "id", col("w"), 37L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === win)
  }

  test("partition-layout and parallelism invariance") {
    val rows = (1L to 500L).map(i => (i * 3 + 1, (i % 29) + 1))
    val a = Shards.assignByBudget(rows.toDF("id", "w").repartition(1), "id", col("w"), 64L)
      .as[(Long, Long, Long)].collect().toSet
    val b = Shards.assignByBudget(rows.toDF("id", "w").repartition(23), "id", col("w"), 64L,
      partitions = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("shards are contiguous id ranges; docs never split; overshoot ≤ one doc") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 600L).map(i => (i, 1L + rnd.nextInt(40).toLong))
    val got = Shards.assignByBudget(rows.toDF("id", "w"), "id", col("w"), 120L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // shard ids non-decreasing in id order
    assert(got.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // each shard's weight, minus its last (straddling) doc, is < budget
    got.groupBy(_._3).foreach { case (s, g) =>
      val sorted = g.sortBy(_._1)
      assert(sorted.init.map(_._2).sum < 120L, s"shard $s overfull before its last doc")
    }
    // total weight conserved
    assert(got.map(_._2).sum === rows.map(_._2).sum)
  }

  test("oversized doc occupies its own start shard and advances several budgets") {
    val rows = Seq((1L, 10L), (2L, 1000L), (3L, 10L))
    val got = Shards.assignByBudget(rows.toDF("id", "w"), "id", col("w"), 100L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).map(_._3).toSeq
    assert(got === Seq(0L, 0L, 10L)) // (10+1000)/100 = 10
  }

  test("null weight counts as zero; row still assigned") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "w")
    val got = Shards.assignByBudget(df, "id", col("w"), 100L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 5L, 0L), (2L, 0L, 0L), (3L, 7L, 0L)))
  }

  test("shardStats aggregates per shard") {
    val rows = (1L to 50L).map(i => (i, 10L))
    val stats = Shards.shardStats(
      Shards.assignByBudget(rows.toDF("id", "w"), "id", col("w"), 100L))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(stats.toSeq === (0L until 5L).map(s => (s, 10L, 100L)))
  }

  test("plan has no single-partition global window") {
    val df = (1L to 100L).map(i => (i, 1L)).toDF("id", "w")
    val plan = Shards.assignByBudget(df, "id", col("w"), 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window in plan:\n$plan")
  }

  test("stratifiedShards: round-robin by quality rank, balanced counts, " +
      "stationary quality mix, partition invariance, no global window") {
    val rows = (1L to 103L).map(i => (i, (i * 37) % 101)) // quality 0..100
    def run(parts: Int): Map[Long, (Long, Long)] =
      Shards.stratifiedShards(
          rows.toDF("id", "q").repartition(parts), "id", col("q"), 4)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val got = run(7)
    // golden: rank = position in (q desc, id asc) order, shard = rank % 4
    val expected = rows.sortBy { case (id, q) => (-q, id) }.zipWithIndex
      .map { case ((id, _), r) => id -> (r.toLong, r.toLong % 4) }.toMap
    assert(got === expected)
    assert(run(1) === got, "partition-layout invariant")
    // balanced: 103 rows over 4 shards -> counts 26/26/26/25
    val sizes = got.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.values.toSeq.sorted === Seq(25, 26, 26, 26))
    // stationary quality mix: per-shard mean quality within 5 of global
    val qOf = rows.toMap
    val gmean = rows.map(_._2).sum.toDouble / rows.length
    got.toSeq.groupBy(_._2._2).foreach { case (s, m) =>
      val mean = m.map(x => qOf(x._1)).sum.toDouble / m.size
      assert(math.abs(mean - gmean) < 5.0, s"shard $s mean $mean vs $gmean")
    }
    val plan = Shards.stratifiedShards(rows.toDF("id", "q"), "id", col("q"), 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window in plan:\n$plan")
  }

  test("chunkDocs: golden windows, overlap, tail clip, short docs, zero shuffle") {
    def toks(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    def run(text: String, window: Int, overlap: Int): Seq[(Int, Long, String)] =
      Shards.chunkDocs(Seq((1L, text)).toDF("id", "text"), "id", "text",
          window, overlap)
        .select(col("chunk_idx"), col("n_chunk_tokens"), col("chunk"))
        .as[(Int, Long, String)].collect().sortBy(_._1).toSeq

    // no overlap: 10 tokens, window 4 → 4+4+2
    assert(run(toks(10), 4, 0) === Seq(
      (0, 4L, "w1 w2 w3 w4"), (1, 4L, "w5 w6 w7 w8"), (2, 2L, "w9 w10")))
    // overlap 2: stride 2 → starts 0,2,4,6
    assert(run(toks(10), 4, 2).map(_._3) === Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    // doc shorter than the window: one whole-doc chunk
    assert(run(toks(3), 64, 16) === Seq((0, 3L, "w1 w2 w3")))
    // doc shorter than the overlap: still one chunk, no dup emission
    assert(run(toks(2), 8, 4) === Seq((0, 2L, "w1 w2")))
    // empty and whitespace-only docs vanish
    assert(run("", 4, 0) === Seq.empty)
    assert(run("   ", 4, 0) === Seq.empty)

    // coverage + overlap properties on random sizes
    for (n <- Seq(1, 5, 47, 48, 49, 63, 64, 65, 200)) {
      val chunks = run(toks(n), 64, 16)
      val all = chunks.flatMap(_._3.split(" ")).toSet
      assert(all === (1 to n).map(i => s"w$i").toSet, s"n=$n full coverage")
      chunks.sliding(2).foreach {
        case Seq(a, b) =>
          val at = a._3.split(" ").toSeq; val bt = b._3.split(" ").toSeq
          assert(at.takeRight(16) === bt.take(16), s"n=$n adjacent overlap = 16")
        case _ =>
      }
    }
    val plan = Shards.chunkDocs(Seq((1L, toks(10))).toDF("id", "text"),
        "id", "text", 4, 0).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunkDocs must not shuffle:\n$plan")
  }
}

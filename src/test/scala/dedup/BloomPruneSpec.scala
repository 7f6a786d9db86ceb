package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("superset, never false-negative: every truly-matching key survives the prune") {
    val big = (1L to 5000L).map(i => (i, i % 997)).toDF("id", "k")
    val small = Seq(3L, 17L, 500L, 996L).toDF("k")
    val pruned = BloomPrune.prune(big, col("k"), small, col("k"), fpp = 0.3)
    val got = pruned.join(small, "k").select("id").as[Long].collect().toSet
    val expect = big.join(small, "k").select("id").as[Long].collect().toSet
    assert(got === expect) // join-after-prune loses nothing, even at fpp 0.3
    assert(pruned.count() < 5000L) // and the prune actually removed rows
  }

  test("probe is Spark's codegen'd might_contain directly above the scan") {
    // spark.range, not a LocalRelation: ConvertToLocalRelation would
    // evaluate the probe at plan time and hide the Filter node
    val big = spark.range(1, 101).select(col("id").as("k"))
    val small = spark.range(1, 11).select(col("id").as("k"))
    val plan = BloomPrune.prune(big, col("k"), small, col("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
    assert(!plan.contains("Exchange")) // map-side only: no shuffle to filter
  }

  test("crossPairs with Bloom pruning is bit-identical to the unpruned plan") {
    val cfg = DedupConfig(threshold = 0.7, ngram = 3, minLength = 3,
      numPerm = 64, seed = 7, idCol = "id", textCol = "text")
    val base = (1L to 80L).map(i => (i, s"existing page $i with some shared words " +
      s"alpha beta gamma ${i % 7} delta epsilon zeta eta")).toDF("id", "text")
    val dups = base.where(col("id") % 5 === 0)
      .withColumn("id", col("id") + 1000L) // planted cross-corpus near-dups
    val batch = (2000L to 2030L).map(i => (i, s"fresh unrelated text $i " +
      "nothing shared here at all today")).toDF("id", "text").unionByName(dups)
    val off = IncrementalDedup.crossPairs(base, batch, cfg)
      .select("bid", "eid", "inter", "uni").collect().map(_.toString).sorted
    val on = IncrementalDedup.crossPairs(base, batch, cfg, pruneFpp = 0.01)
      .select("bid", "eid", "inter", "uni").collect().map(_.toString).sorted
    assert(off.nonEmpty) // planted dups guarantee pairs
    assert(on.toSeq === off.toSeq)
  }

  test("bucketCap composes with pruning: cap applies to the surviving buckets") {
    val cfg = DedupConfig(threshold = 0.7, ngram = 3, minLength = 3,
      numPerm = 64, seed = 7, idCol = "id", textCol = "text")
    // a hot bucket: many identical corpus docs, one batch dup of them
    val hot = (1L to 40L).map(i => (i, "identical boilerplate page shared " +
      "by every mirror of the same template")).toDF("id", "text")
    val batch = Seq((9000L, "identical boilerplate page shared " +
      "by every mirror of the same template")).toDF("id", "text")
    val got = IncrementalDedup.newDocsFuzzy(hot, batch, cfg,
      bucketCap = 4, pruneFpp = 0.01)
    assert(got.count() === 0L) // the dup is still caught under cap + prune
  }
}

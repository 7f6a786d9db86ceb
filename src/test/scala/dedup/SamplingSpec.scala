package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SamplingSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("capPerKey keeps the n smallest ids per key (window-oracle equality)") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (s"k${rnd.nextInt(9)}", i))
    val df = rows.toDF("key", "id")
    val got = Sampling.capPerKey(df, col("key"), col("id"), 5)
      .as[(String, Long)].collect().toSet
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      g.map(_._2).sorted.take(5).map(k -> _)
    }.toSet
    assert(got === expect)
  }

  test("hot key: partial aggregation bounds what one task emits") {
    // one key carries 10k rows across many partitions; the plan must show
    // a partial aggregate (map-side combine) so no task ships 10k rows
    val df = (1L to 10000L).map(i => ("hot", i)).toDF("key", "id").repartition(16)
    val capped = Sampling.capPerKey(df, col("key"), col("id"), 3)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("partial_minnagg") || plan.toLowerCase.contains("partial"),
      s"no partial aggregate in plan:\n$plan")
    assert(capped.as[(String, Long)].collect().toSet ===
      Set(("hot", 1L), ("hot", 2L), ("hot", 3L)))
  }

  test("cap larger than group keeps everything; null keys dropped") {
    val df = Seq(("a", 1L), ("a", 2L), (null, 3L)).toDF("key", "id")
    val got = Sampling.capPerKey(df, col("key"), col("id"), 10)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("a", 1L), ("a", 2L)))
  }

  test("partition-layout invariance") {
    val rows = (1L to 300L).map(i => (s"d${i % 7}", i))
    val a = Sampling.capPerKey(rows.toDF("key", "id").repartition(1),
      col("key"), col("id"), 4).as[(String, Long)].collect().toSet
    val b = Sampling.capPerKey(rows.toDF("key", "id").repartition(17),
      col("key"), col("id"), 4).as[(String, Long)].collect().toSet
    assert(a === b)
  }

  test("domainCap: at most N pages per registrable domain, payload intact") {
    val pages = (1L to 120L).map { i =>
      (i, s"https://sub$i.site${i % 3}.org/p/$i", s"text $i")
    }.toDF("id", "url", "text")
    val kept = Sampling.domainCap(pages, "url", "id", 10)
    assert(kept.columns.toSeq === Seq("id", "url", "text"))
    val byDomain = kept.select(UrlOps.domain(col("url")).as("d"), col("id"))
      .as[(String, Long)].collect().groupBy(_._1)
    assert(byDomain.keySet === Set("site0.org", "site1.org", "site2.org"))
    byDomain.foreach { case (d, g) =>
      assert(g.length === 10, s"domain $d kept ${g.length}")
      // min-id rule: the kept ids are the 10 smallest of the domain
      val all = (1L to 120L).filter(i => i % 3 == d.stripPrefix("site").stripSuffix(".org").toLong)
      assert(g.map(_._2).sorted.toSeq === all.sorted.take(10))
    }
  }

  test("topWords: global top-k by (count desc, word asc)") {
    val df = Seq(
      "a a a b b c", "b c d", "a  b", "").toDF("text")
    val got = TextAnalysis.topWords(df, "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 4L), ("b", 4L), ("c", 2L)))
    val plan = TextAnalysis.topWords(df, "text", 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
  }
}

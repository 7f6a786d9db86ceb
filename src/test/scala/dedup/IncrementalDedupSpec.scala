package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def corpus(ids: Seq[Long], text: Long => String) =
    ids.map(i => (i, text(i))).toDF("id", "text")

  test("exact semantics: equals brute-force anti-join on md5(text)") {
    val existing = corpus(1L to 200L, i => s"doc ${i % 60}") // 60 distinct texts
    val batch = corpus(1000L to 1100L, i => s"doc ${i % 90}") // overlaps 0..59
    val got = IncrementalDedup.newDocs(existing, batch, "id", "text")
      .select("id").as[Long].collect().sorted
    val expect = batch.join(
        existing.select(md5(col("text")).as("h")).distinct(),
        md5(batch("text")) === col("h"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === expect.toSeq)
    assert(got.nonEmpty && got.length < 101) // some new, some dups
  }

  test("no false negatives at any fpp: every truly-new doc survives") {
    val existing = corpus(1L to 500L, i => s"page $i")
    val batch = corpus(2000L to 2050L, i => s"fresh $i")
    // even a terrible fpp cannot drop a new doc (confirm join is exact)
    val got = IncrementalDedup.newDocs(existing, batch, "id", "text", fpp = 0.5)
      .count()
    assert(got === 51L)
  }

  test("null text is always new on both sides") {
    val existing = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val batch = Seq((10L, null.asInstanceOf[String]), (11L, "a"), (12L, "b"))
      .toDF("id", "text")
    val got = IncrementalDedup.newDocs(existing, batch, "id", "text")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === Seq(10L, 12L))
  }

  test("prebuilt bloom roundtrips through save/load and gives same answer") {
    val existing = corpus(1L to 300L, i => s"doc ${i % 40}")
    val batch = corpus(5000L to 5060L, i => s"doc ${i % 80}")
    val bloom = IncrementalDedup.buildBloom(existing, "text")
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    IncrementalDedup.saveBloom(spark, bloom, s"$dir/corpus.bloom")
    val loaded = IncrementalDedup.loadBloom(spark, s"$dir/corpus.bloom")
    val a = IncrementalDedup.newDocs(existing, batch, "id", "text", Some(bloom))
      .select("id").as[Long].collect().sorted
    val b = IncrementalDedup.newDocs(existing, batch, "id", "text", Some(loaded))
      .select("id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("bloom prefilter is load-bearing: rejects most new keys before any join") {
    val existing = corpus(1L to 1000L, i => s"page $i")
    val bloom = IncrementalDedup.buildBloom(existing, "text", fpp = 0.01)
    val newKeys = (1 to 1000).map(i => s"fresh $i")
    val fp = newKeys.count { k =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
      bloom.mightContainString(h)
    }
    assert(fp < 50, s"false-positive count $fp should be ~1% of 1000")
    // and zero false negatives by construction
    val present = (1 to 1000).forall { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"page $i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      bloom.mightContainString(h)
    }
    assert(present)
  }
}

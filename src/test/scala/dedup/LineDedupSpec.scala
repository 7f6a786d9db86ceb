package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class LineDedupSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def run(docs: Seq[(Long, String)]): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    LineDedup.dedupLines(docs.toDF("id", "text"), "id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("globally-first occurrence kept, later repeats dropped (cross-doc)") {
    val out = run(Seq(
      1L -> "alpha\nsubscribe to our newsletter\nbeta",
      2L -> "gamma\nsubscribe to our newsletter\ndelta",
      3L -> "subscribe to our newsletter"))
    assert(out(1L)._1 === "alpha\nsubscribe to our newsletter\nbeta")
    assert(out(2L)._1 === "gamma\ndelta")
    assert(out(3L)._1 === "")
    assert(out(2L)._2 === 3L && out(2L)._3 === 2L)
  }

  test("within-doc repeat: earlier position wins") {
    val out = run(Seq(7L -> "same line\nother\nsame line"))
    assert(out(7L)._1 === "same line\nother")
  }

  test("blank lines are structure: never deduped, byte-preserved") {
    val out = run(Seq(
      1L -> "a\n\nb",
      2L -> "c\n\n\nd",
      // whitespace-only line counts as blank
      3L -> "e\n  \nf"))
    assert(out(1L)._1 === "a\n\nb")
    assert(out(2L)._1 === "c\n\n\nd")
    assert(out(3L)._1 === "e\n  \nf")
  }

  test("order is (id, pos), not insertion/partition order") {
    // doc 10 holds the line at pos 2; doc 5 at pos 0 — doc 5 wins even
    // though doc 10 is listed first.
    val out = run(Seq(
      10L -> "x\ny\nshared footer",
      5L -> "shared footer\nz"))
    assert(out(5L)._1 === "shared footer\nz")
    assert(out(10L)._1 === "x\ny")
  }

  test("null text passes through; single-line docs work") {
    import spark.implicits._
    val df = Seq((1L, "only"), (2L, null.asInstanceOf[String]), (3L, "only"))
      .toDF("id", "text")
    val out = LineDedup.dedupLines(df, "id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some("only"))
    assert(out(2L) === None)
    assert(out(3L) === Some(""))
  }

  test("partition-layout invariance (deterministic representative)") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"head $i\ncommon boilerplate ${i % 4}\ntail ${i % 7}"))
    val a = LineDedup.dedupLines(docs.toDF("id", "text").repartition(1), "id", "text")
      .orderBy("id").collect().map(_.toSeq)
    val b = LineDedup.dedupLines(docs.toDF("id", "text").repartition(13), "id", "text")
      .orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("brute-force oracle on a random-ish corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (1L to 60L).map { i =>
      val n = 1 + rnd.nextInt(5)
      (i, (0 until n).map(_ => s"line ${rnd.nextInt(30)}").mkString("\n"))
    }
    // driver-side reference implementation
    val seen = scala.collection.mutable.HashSet[String]()
    val expect = docs.sortBy(_._1).map { case (id, t) =>
      val kept = t.split("\n", -1).filter { l =>
        if (l.trim.isEmpty) true else seen.add(l)
      }
      id -> kept.mkString("\n")
    }.toMap
    val got = LineDedup.dedupLines(docs.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === expect)
  }
}

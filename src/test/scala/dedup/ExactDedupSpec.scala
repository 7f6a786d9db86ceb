package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class ExactDedupSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("normalizeText: lowercase, punctuation strip, whitespace collapse, trim") {
    import spark.implicits._
    val out = Seq(
      "  Hello,   WORLD!! ",
      "hello world",
      "HELLO\tworld.",
      "unrelated text").toDF("text")
      .select(ExactDedup.normalizeText(col("text")).as("nt"))
      .collect().map(_.getString(0))
    assert(out(0) === "hello world")
    assert(out(1) === "hello world")
    assert(out(2) === "hello world")
    assert(out(3) === "unrelated text")
  }

  test("normalizedAssignments: case/punct/spacing variants collapse, distinct texts don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick brown fox."),
      (2L, "  the QUICK brown fox"),
      (3L, "the quick   brown — fox!!"),
      (4L, "a different document"),
      (5L, "A DIFFERENT DOCUMENT")).toDF("id", "text")
    val a = ExactDedup.normalizedAssignments(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a(1L) === 1L && a(2L) === 1L && a(3L) === 1L)
    assert(a(4L) === 4L && a(5L) === 4L)
    // byte-exact dedup would NOT collapse these (the variants are real)
    val exact = ExactDedup.assignments(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.forall { case (id, comp) => id === comp })
  }

  test("normalizedKept keeps the min-id representative, payload intact") {
    import spark.implicits._
    val docs = Seq(
      (7L, "Some Text Here", "en"),
      (9L, "some  text here!", "de"),
      (8L, "other text", "en")).toDF("id", "text", "lang")
    val kept = ExactDedup.normalizedKept(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(kept.map(_._1).toSeq === Seq(7L, 8L))
    assert(kept.head._2 === "en")
  }
}

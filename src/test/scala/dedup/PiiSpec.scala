package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class PiiSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Pii.redact(col("t"))).collect().head.getString(0)
  }

  private def counts(s: String): (Long, Long, Long) = {
    import spark.implicits._
    val (e, i, p) = Pii.piiCounts(col("t"))
    val r = Seq(s).toDF("t").select(e, i, p).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("emails redacted, incl. dots/plus in local part") {
    assert(redact("mail me at jane.doe+spam@sub.example.co.uk today") ===
      "mail me at <EMAIL> today")
    assert(redact("a@b.io x@y.org") === "<EMAIL> <EMAIL>")
  }

  test("ipv4 redacted; octet range and digit-run guards hold") {
    assert(redact("server 10.0.255.1 down") === "server <IP> down")
    assert(redact("at 192.168.0.1.") === "at <IP>.")
    // not IPv4: octet > 255, or embedded in longer dotted run
    assert(redact("version 1.2.3.4.5") === "version 1.2.3.4.5")
    assert(redact("val 999.1.1.1") === "val 999.1.1.1")
  }

  test("phones need a leading +; separators allowed") {
    assert(redact("call +1 555 014 2398 now") === "call <PHONE> now")
    assert(redact("tel: +49-170-1234567") === "tel: <PHONE>")
    // bare digit runs (years, ids, quantities) untouched
    assert(redact("order 1234567890 from 2024") === "order 1234567890 from 2024")
  }

  test("order: email local-part digits and IP dots never leak into phones") {
    assert(redact("u12345678@ex.com and 10.20.30.40 and +33 612345678") ===
      "<EMAIL> and <IP> and <PHONE>")
  }

  test("clean text is untouched; null-safe") {
    import spark.implicits._
    val clean = "the quick brown fox 42 jumps over 13 lazy dogs"
    assert(redact(clean) === clean)
    val r = Seq[String](null).toDF("t").select(Pii.redact(col("t"))).collect().head
    assert(r.isNullAt(0))
  }

  test("piiCounts match the number of redactions") {
    assert(counts("a@b.io x@y.org 10.0.0.1 +1 5550142398") === ((2L, 1L, 1L)))
    assert(counts("nothing here") === ((0L, 0L, 0L)))
  }

  test("plan: pure projection, no shuffle, no udf") {
    import spark.implicits._
    val df = (1 to 10).map(i => s"t$i").toDF("t").select(Pii.redact(col("t")).as("r"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }
}

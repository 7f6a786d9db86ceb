package dedup

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("pages: schema-enforced parquet roundtrip; maxFiles caps sorted file list") {
    val dir = Files.createTempDirectory("pages").toString
    val ps = Synth.pages(spark, 50L)
    ps.toDF().repartition(3).write.mode("overwrite").parquet(dir)
    val back = Sources.pages(spark, dir)
    // parquet read-back forces nullable=true; names+types are the contract
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Page.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() === 50L)
    val capped = Sources.pages(spark, dir, maxFiles = Some(1))
    assert(capped.count() > 0L)
    assert(capped.count() < 50L)
  }

  test("pagesJsonl: declared schema + corrupt-record surfacing") {
    val dir = Files.createTempDirectory("jsonl")
    val f = dir.resolve("docs.jsonl")
    Files.writeString(f,
      """{"url":"u1","text":"hello world","lang":"en"}
        |{"url":"u2","text":"zweite zeile","lang":"de"}
        |{not valid json
        |""".stripMargin)
    // Spark disallows querying only the corrupt-record column of a raw
    // JSON scan — cache the parsed result first (documented Spark rule)
    val df = Sources.pagesJsonl(spark, f.toString).cache()
    import org.apache.spark.sql.functions._
    assert(df.where(col("url").isNotNull).count() === 2L)
    assert(df.where(col("_corrupt_record").isNotNull).count() === 1L)
    df.unpersist()
  }

  test("pagesOrc: schema-enforced ORC roundtrip") {
    val dir = Files.createTempDirectory("orc").toString
    Synth.pages(spark, 40L).toDF().write.mode("overwrite").orc(dir)
    val back = Sources.pagesOrc(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Page.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() === 40L)
    // payload survives byte-identically (the text-extraction invariant)
    import org.apache.spark.sql.functions._
    val a = Synth.pages(spark, 40L).toDF()
      .select(col("url"), col("text")).collect().map(r => (r.getString(0), r.getString(1))).sorted
    val b = back.select(col("url"), col("text")).collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("pagesCsv: quoted multiline text, typed null html, corrupt-record surfacing") {
    val dir = Files.createTempDirectory("csv")
    val f = dir.resolve("pages.csv")
    Files.writeString(f,
      "url,warc_ts,text,lang\n" +
        "https://a/1,2024-01-02 03:04:05,\"line one\nline two\",en\n" +
        "https://a/2,not-a-timestamp,plain text,de\n")
    import org.apache.spark.sql.functions._
    val df = Sources.pagesCsv(spark, f.toString).cache()
    assert(df.schema.fieldNames.take(5).toSeq === Page.schema.fieldNames.toSeq)
    assert(df.schema("html").dataType === org.apache.spark.sql.types.BinaryType)
    val good = df.where(col("_corrupt_record").isNull).collect()
    assert(good.length === 1)
    assert(good.head.getAs[String]("text") === "line one\nline two")
    assert(good.head.getAs[java.sql.Timestamp]("warc_ts") !== null)
    assert(df.where(col("_corrupt_record").isNotNull).count() === 1L) // bad timestamp row
    df.unpersist()
  }

  test("pagesText: one line = one doc with stable content-hash url") {
    val dir = Files.createTempDirectory("txt")
    val f = dir.resolve("docs.txt")
    Files.writeString(f, "first doc line\nsecond doc line\n")
    val df = Sources.pagesText(spark, f.toString)
    assert(df.schema.fieldNames.toSeq === Page.schema.fieldNames.toSeq)
    val urls1 = df.select("url").collect().map(_.getString(0)).sorted
    val urls2 = Sources.pagesText(spark, f.toString)
      .select("url").collect().map(_.getString(0)).sorted
    assert(urls1.length === 2)
    assert(urls1.toSeq === urls2.toSeq)
  }
}

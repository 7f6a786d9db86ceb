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

  test("writeBucketed + recoverBucketedTable: data round-trips, bucketing " +
      "metadata survives catalog loss, co-located join is exchange-free") {
    import spark.implicits._
    val dirA = Files.createTempDirectory("bktA").toString
    val dirB = Files.createTempDirectory("bktB").toString
    val a = (0L until 500L).map(i => (i, s"text $i")).toDF("id", "text")
    val b = (0L until 500L by 2).map(i => (i, i * 10)).toDF("id", "score")
    Sources.writeBucketed(a, "bkt_a", dirA, "id", 4)
    Sources.writeBucketed(b, "bkt_b", dirB, "id", 4)
    // at this toy size the planner prefers a broadcast join (which also
    // avoids shuffling, but proves nothing about bucketing) — disable it
    // so the plan must choose between Exchange+SMJ and the bucketed scan
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      assert(joined.count() === 250L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed-by-id join must not shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan used:\n$plan")
      // catalog loss (new session / resume): re-register from files only
      spark.sql("DROP TABLE bkt_b")
      val recovered = Sources.recoverBucketedTable(spark, "bkt_b", dirB, "id", 4)
      assert(recovered.count() === 250L)
      val joined2 = spark.table("bkt_a").join(recovered, "id")
      assert(joined2.count() === 250L)
      val plan2 = joined2.queryExecution.executedPlan.toString
      assert(!plan2.contains("ShuffleExchange") && plan2.contains("Bucketed: true"),
        s"recovered table keeps the shuffle-free join:\n$plan2")
      // idempotent when the table already exists
      assert(Sources.recoverBucketedTable(spark, "bkt_b", dirB, "id", 4)
        .count() === 250L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}

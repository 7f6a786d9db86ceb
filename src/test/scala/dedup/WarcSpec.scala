package dedup

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  /** Hand-built WARC/1.0 record per ISO 28500: version line, CRLF headers,
    * blank line, Content-Length octets, CRLF CRLF. */
  private def record(tpe: String, uri: String, date: String, block: Array[Byte]): Array[Byte] = {
    val hdr = new StringBuilder()
    hdr.append("WARC/1.0\r\n")
    hdr.append(s"WARC-Type: $tpe\r\n")
    if (uri != null) hdr.append(s"WARC-Target-URI: $uri\r\n")
    hdr.append(s"WARC-Date: $date\r\n")
    hdr.append("WARC-Record-ID: <urn:uuid:0000>\r\n")
    hdr.append(s"Content-Length: ${block.length}\r\n")
    hdr.append("\r\n")
    hdr.toString.getBytes("ISO-8859-1") ++ block ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def httpResponse(body: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body).getBytes("UTF-8")

  private def archive: Array[Byte] =
    record("warcinfo", null, "2024-01-01T00:00:00Z",
      "software: synthetic\r\n".getBytes) ++
    record("request", "http://a.example/1", "2024-03-05T10:20:30Z",
      "GET /1 HTTP/1.1\r\nHost: a.example\r\n\r\n".getBytes) ++
    record("response", "http://a.example/1", "2024-03-05T10:20:30Z",
      httpResponse("<html><body>page one</body></html>")) ++
    record("response", "<http://b.example/2>", "2024-03-05T11:00:00Z", // bracketed URI
      httpResponse("<html><body>page two</body></html>"))

  private def gzipMembers(recs: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    recs.foreach { r => // one gzip MEMBER per record, Common Crawl layout
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(r); gz.finish(); gz.close()
    }
    bos.toByteArray
  }

  test("records: response-only parse, http body split, bracketed URIs, ts parse") {
    val recs = Warc.records(new java.io.ByteArrayInputStream(archive)).toSeq
    assert(recs.map(_.url) === Seq("http://a.example/1", "http://b.example/2"))
    assert(new String(recs(0).html, "UTF-8") === "<html><body>page one</body></html>")
    assert(recs(0).ts === java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-05T10:20:30Z")))
  }

  test("records: truncated tail is dropped, prior records survive; never throws") {
    val truncated = archive.dropRight(30) // cut into the LAST record's block
    val recs = Warc.records(new java.io.ByteArrayInputStream(truncated)).toSeq
    assert(recs.map(_.url) === Seq("http://a.example/1"))
    assert(Warc.records(new java.io.ByteArrayInputStream(Array[Byte]())).toSeq === Nil)
    assert(Warc.records(new java.io.ByteArrayInputStream(
      "random junk\nnot a warc\n".getBytes)).toSeq === Nil)
  }

  test("records: a garbled Content-Length drops ONE record, not the archive tail") {
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://bad.example/\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 12a\r\n\r\n")
      .getBytes("ISO-8859-1")
    val wire = record("response", "http://a.example/1", "2024-03-05T10:20:30Z",
      httpResponse("<p>one</p>")) ++ bad ++
      record("response", "http://c.example/2", "2024-03-05T12:00:00Z",
        httpResponse("<p>two</p>"))
    val recs = Warc.records(new java.io.ByteArrayInputStream(wire)).toSeq
    assert(recs.map(_.url) === Seq("http://a.example/1", "http://c.example/2"))
  }

  test("httpBody: chunked transfer decoded, gzip content decoded, best-effort fallback") {
    val body = "<html><body>compressed page body</body></html>"
    // chunked: two chunks + terminator
    val chunked = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      f"${10}%x\r\n" + body.take(10) + "\r\n" +
      f"${body.length - 10}%x\r\n" + body.drop(10) + "\r\n0\r\n\r\n").getBytes("ISO-8859-1")
    assert(new String(Warc.httpBody(chunked), "UTF-8") === body)
    // gzip content-encoding
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(body.getBytes("UTF-8")); gz.close()
    val gzipped = "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n".getBytes("ISO-8859-1") ++
      bos.toByteArray
    assert(new String(Warc.httpBody(gzipped), "UTF-8") === body)
    // malformed gzip: raw bytes fall through, never a throw
    val broken = "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot gzip".getBytes("ISO-8859-1")
    assert(new String(Warc.httpBody(broken), "UTF-8") === "not gzip")
    // a .gz ARTIFACT served verbatim: Content-Type mentions gzip but the
    // Content-Encoding is identity — the payload must pass through as-is
    // (substring matching over the header block used to gunzip it; the
    // decode succeeds so the fallback can't catch it — ADVICE r3)
    val artifact = ("HTTP/1.1 200 OK\r\nContent-Type: application/x-gzip\r\n" +
      "Content-Encoding: identity\r\n\r\n").getBytes("ISO-8859-1") ++ bos.toByteArray
    assert(Warc.httpBody(artifact).toSeq === bos.toByteArray.toSeq,
      "verbatim .gz artifact must not be decompressed")
    // header parsing is case-insensitive and value-scoped
    val upper = ("HTTP/1.1 200 OK\r\nCONTENT-ENCODING: GZIP\r\n\r\n")
      .getBytes("ISO-8859-1") ++ bos.toByteArray
    assert(new String(Warc.httpBody(upper), "UTF-8") === body)
  }

  test("httpBody: CRLF and bare-LF header terminators; headerless blocks pass through") {
    assert(new String(Warc.httpBody("HTTP/1.1 200 OK\r\nA: b\r\n\r\nBODY".getBytes)) === "BODY")
    assert(new String(Warc.httpBody("HTTP/1.1 200 OK\nA: b\n\nBODY".getBytes)) === "BODY")
    assert(new String(Warc.httpBody("no headers at all".getBytes)) === "no headers at all")
  }

  test("property: random archives round-trip (plain and gzipped), binary bodies intact") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 25) {
      val nRecs = 1 + rnd.nextInt(8)
      val recs = (0 until nRecs).map { k =>
        val tpe = Seq("response", "request", "metadata")(rnd.nextInt(3))
        val uri = s"http://h${rnd.nextInt(100)}.example/p${rnd.nextInt(1000)}"
        // binary body: arbitrary bytes INCLUDING CRLFs and fake WARC/ lines
        val body = new Array[Byte](rnd.nextInt(500))
        rnd.nextBytes(body)
        val block =
          if (rnd.nextBoolean()) httpResponse("") ++ body // with http headers
          else body                                       // bare content
        (tpe, uri, block, record(tpe, uri, "2024-06-01T00:00:00Z", block))
      }
      val archiveBytes = recs.map(_._4).reduce(_ ++ _)
      val in: java.io.InputStream =
        if (trial % 2 == 0) new java.io.ByteArrayInputStream(archiveBytes)
        else new java.util.zip.GZIPInputStream( // pages() wraps after magic sniff
          new java.io.ByteArrayInputStream(gzipMembers(recs.map(_._4))))
      val parsed = Warc.records(in).toSeq
      val expect = recs.filter(_._1 == "response")
      assert(parsed.length === expect.length, s"trial $trial")
      parsed.zip(expect).foreach { case (got, (_, uri, block, _)) =>
        assert(got.url === uri, s"trial $trial")
        assert(got.html.toSeq === Warc.httpBody(block).toSeq, s"trial $trial")
      }
    }
  }

  test("pages: plain and multi-member-gzip archives -> Page table; pipeline composes") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("warc")
    java.nio.file.Files.write(dir.resolve("part1.warc"), archive)
    java.nio.file.Files.write(dir.resolve("part2.warc.gz"), gzipMembers(Seq(
      record("response", "http://c.example/3", "2024-04-01T00:00:00Z",
        httpResponse("<html><body>page three from gz</body></html>")))))
    val df = Warc.pages(spark, dir.toString)
    // same columns and types as the declared page contract (the case-class
    // encoder marks url nullable; the parquet contract marks it required)
    assert(df.schema.map(f => (f.name, f.dataType)) ===
      Page.schema.map(f => (f.name, f.dataType)))
    val rows = df.select(col("url"), decode(col("html"), "UTF-8")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.keySet === Set(
      "http://a.example/1", "http://b.example/2", "http://c.example/3"))
    assert(rows("http://c.example/3").contains("page three from gz"))
    // full pipeline from raw WARC: --input-warc --extract-html
    val out = java.nio.file.Files.createTempDirectory("warcout").toString
    val args = Pipeline.parse(Array(
      "--input-warc", dir.toString, "--output", out,
      "--extract-html", "--num-perm", "64", "--salt", "4", "--min-length", "1"))
    val (kept, assigns) = Pipeline.run(spark, args)
    assert(assigns.count() === 3L && kept.count() === 3L)
    val texts = kept.select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(texts("http://a.example/1") === "page one")
  }

  test("wetPages: conversion records -> text column; warcinfo/request excluded; UTF-8") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("wet")
    // a WET file: warcinfo header record + conversion records whose block
    // IS the extracted text (no HTTP framing) — non-ASCII exercises UTF-8
    val wet =
      record("warcinfo", null, "2024-01-01T00:00:00Z",
        "software: wet-synth\r\n".getBytes) ++
      record("conversion", "http://a.example/1", "2024-03-05T10:20:30Z",
        "Extraits de texte — déjà extraits.\nSecond line.".getBytes("UTF-8")) ++
      record("conversion", "<http://b.example/2>", "2024-03-05T11:00:00Z",
        "plain ascii text".getBytes("UTF-8")) ++
      record("response", "http://c.example/skip", "2024-03-05T12:00:00Z",
        httpResponse("<p>an html record in the wrong file</p>"))
    java.nio.file.Files.write(dir.resolve("chunk.warc.wet"), wet)
    // gz member layout works identically to pages()
    java.nio.file.Files.write(dir.resolve("chunk2.warc.wet.gz"), gzipMembers(Seq(
      record("conversion", "http://d.example/3", "2024-04-01T00:00:00Z",
        "gz member text".getBytes("UTF-8")))))
    val df = Warc.wetPages(spark, dir.toString)
    assert(df.schema.map(f => (f.name, f.dataType)) ===
      Page.schema.map(f => (f.name, f.dataType)))
    val rows = df.select(col("url"), col("text"), col("html")).collect()
      .map(r => (r.getString(0), r.getString(1), r.get(2))).toList
    assert(rows.map(_._1).toSet === Set("http://a.example/1",
      "http://b.example/2", "http://d.example/3"))
    assert(rows.forall(_._3 == null), "WET rows carry no html")
    assert(rows.find(_._1 == "http://a.example/1").get._2
      === "Extraits de texte — déjà extraits.\nSecond line.")
    // --input-wet feeds the pipeline with pre-extracted text directly
    val out = java.nio.file.Files.createTempDirectory("wetout").toString
    val args = Pipeline.parse(Array(
      "--input-wet", dir.toString, "--output", out,
      "--num-perm", "64", "--salt", "4", "--min-length", "1"))
    val (kept, assigns) = Pipeline.run(spark, args)
    assert(assigns.count() === 3L && kept.count() === 3L)
    // --extract-html is rejected for WET (text is already extracted)
    val ex = intercept[IllegalArgumentException] {
      Pipeline.parse(Array("--input-wet", dir.toString, "--output", out,
        "--extract-html"))
    }
    assert(ex.getMessage.contains("WET"))
  }

  test("watRecords: metadata records -> verbatim json; Catalyst parses downstream") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("wat")
    val env1 = """{"Envelope":{"WARC-Header-Metadata":{"WARC-Type":"response"},""" +
      """"Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":""" +
      """{"Head":{"Title":"Page One"},"Links":[{"url":"http://x.example/"}]}}}}}"""
    val env2 = """{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":""" +
      """{"HTML-Metadata":{"Head":{"Title":"Page Two"}}}}}}"""
    val wat =
      record("warcinfo", null, "2024-01-01T00:00:00Z",
        "software: wat-synth\r\n".getBytes) ++
      record("metadata", "http://a.example/1", "2024-03-05T10:20:30Z",
        env1.getBytes("UTF-8")) ++
      record("metadata", "http://b.example/2", "2024-03-05T11:00:00Z",
        env2.getBytes("UTF-8")) ++
      // defensive: a non-JSON metadata block is dropped, not surfaced
      record("metadata", "http://c.example/3", "2024-03-05T12:00:00Z",
        "not json at all".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("chunk.warc.wat"), wat)
    val df = Warc.watRecords(spark, dir.toString)
    assert(df.columns.toSeq === Seq("url", "warc_ts", "json"))
    val titles = df
      .select(col("url"),
        get_json_object(col("json"),
          "$.Envelope['Payload-Metadata']['HTTP-Response-Metadata']" +
            "['HTML-Metadata'].Head.Title").as("title"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(titles === Map(
      "http://a.example/1" -> "Page One",
      "http://b.example/2" -> "Page Two"))
  }
}

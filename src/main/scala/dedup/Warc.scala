package dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.{BufferedInputStream, EOFException, InputStream}

/** WARC (ISO 28500 / WARC/1.0-1.1) source: reads Common-Crawl-style
  * crawl archives straight into the page table shape
  * `(url, warc_ts, html, text=null, lang=null)` — the step BEFORE
  * `--extract-html` for corpora that arrive as raw crawl archives rather
  * than parquet. The reference reads only parquet/jsonl (SURVEY.md §2.1);
  * this is the same value-add class as the ORC/CSV sources.
  *
  * Format facts used (all from the public spec + Common Crawl layout):
  *   - a record = version line `WARC/1.x`, CRLF-terminated named headers,
  *     blank line, `Content-Length` octets of block, CRLF CRLF;
  *   - `WARC-Type: response` records carry an HTTP response as the block:
  *     status line + headers, blank line, entity body (the html);
  *   - `.warc.gz` files are MULTI-MEMBER gzip — one member per record —
  *     so members must be decompressed in sequence (GZIPInputStream
  *     handles concatenated members natively).
  *
  * Scale shape: `sc.binaryFiles` hands each archive to a task as a
  * PortableDataStream — records are STREAM-parsed (one record's block in
  * memory at a time, never the whole ~1 GB archive), the RDD drop is the
  * sanctioned per-partition imperative case (a stateful byte-stream
  * parser has no Catalyst spelling), and the output immediately re-enters
  * Dataset land with the declared Page schema. Malformed records are
  * skipped, not thrown (a crawl archive at 10⁵-file scale always carries
  * a few truncated members).
  */
object Warc {

  /** One parsed response record. */
  private[dedup] final case class Rec(url: String, ts: java.sql.Timestamp, html: Array[Byte])

  /** One raw record of ANY WARC-Type, block verbatim (no HTTP-body
    * stripping) — the shared substrate for the WARC/WET/WAT readers. */
  private[dedup] final case class RawRec(
      tpe: String, url: String, ts: java.sql.Timestamp, block: Array[Byte])

  /** CRLF-terminated line as ISO-8859-1 (WARC headers are octets);
    * returns null at EOF. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    if (n > Int.MaxValue - 8) throw new EOFException(s"block too large: $n")
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < buf.length) {
      val r = in.read(buf, off, buf.length - off)
      if (r < 0) throw new EOFException(s"truncated block at $off/$n")
      off += r
    }
    buf
  }

  /** The entity body of an HTTP response block: everything after the
    * first CRLFCRLF (or LFLF) header terminator; the whole block if no
    * terminator is found (some archives store bare content). Honors the
    * HTTP headers the split already scanned past: `Transfer-Encoding:
    * chunked` bodies are de-chunked and `Content-Encoding: gzip` bodies
    * decompressed (both occur in real Common Crawl / Heritrix archives —
    * storing them raw would put compressed/chunk-framed bytes in the html
    * column). Decoding is best-effort: a malformed encoding falls back to
    * the raw bytes, never throws. */
  private[dedup] def httpBody(block: Array[Byte]): Array[Byte] = {
    var split = -1
    var i = 0
    while (split < 0 && i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
          block(i + 2) == '\r' && block(i + 3) == '\n') split = i + 4
      i += 1
    }
    if (split < 0) {
      i = 0
      while (split < 0 && i + 1 < block.length) {
        if (block(i) == '\n' && block(i + 1) == '\n') split = i + 2
        i += 1
      }
    }
    if (split < 0) return block
    val headers = new String(block, 0, split,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // parse actual name:value header lines — substring-matching the whole
    // block wrongly gunzipped a verbatim .gz payload whose headers merely
    // MENTIONED gzip elsewhere (Content-Type: application/x-gzip with
    // Content-Encoding: identity): the decode succeeds, so the best-effort
    // fallback can't save it (ADVICE r3). First line is the status line;
    // header names are case-insensitive, values may be parameter lists.
    def headerValues(name: String): Iterator[String] =
      headers.split("\r?\n").iterator.drop(1).flatMap { l =>
        val c = l.indexOf(':')
        if (c > 0 && l.substring(0, c).trim.equalsIgnoreCase(name))
          Some(l.substring(c + 1).trim.toLowerCase(java.util.Locale.ROOT))
        else None
      }
    var body = java.util.Arrays.copyOfRange(block, split, block.length)
    if (headerValues("transfer-encoding").exists(_.contains("chunked")))
      body = dechunk(body).getOrElse(body)
    if (headerValues("content-encoding").exists(v =>
        v.contains("gzip") || v.contains("x-gzip")))
      body = gunzip(body).getOrElse(body)
    body
  }

  /** HTTP/1.1 chunked-transfer decoding: hex size line, chunk, CRLF,
    * repeat until the 0-size chunk. None on any malformation. */
  private[dedup] def dechunk(body: Array[Byte]): Option[Array[Byte]] = try {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var i = 0
    var done = false
    while (!done) {
      var j = i // hex size up to ';' (chunk extension) or CR
      while (j < body.length && body(j) != '\r' && body(j) != '\n' && body(j) != ';') j += 1
      val size = Integer.parseInt(
        new String(body, i, j - i, java.nio.charset.StandardCharsets.US_ASCII).trim, 16)
      while (j < body.length && body(j) != '\n') j += 1 // end of size line
      j += 1
      if (size == 0) done = true
      else {
        if (j + size > body.length) return None
        out.write(body, j, size)
        j += size
        while (j < body.length && (body(j) == '\r' || body(j) == '\n')) j += 1
      }
      i = j
    }
    Some(out.toByteArray)
  } catch { case _: Exception => None }

  private[dedup] def gunzip(body: Array[Byte]): Option[Array[Byte]] = try {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(body), 1 << 14)
    val out = new java.io.ByteArrayOutputStream(body.length * 4)
    val buf = new Array[Byte](1 << 14)
    var r = in.read(buf)
    while (r > 0) { out.write(buf, 0, r); r = in.read(buf) }
    Some(out.toByteArray)
  } catch { case _: Exception => None }

  private def parseTs(s: String): java.sql.Timestamp =
    try java.sql.Timestamp.from(java.time.Instant.parse(s))
    catch { case _: Exception => null }

  /** Stream-parse WARC records of ANY type (blocks verbatim); emits one
    * RawRec per record that has a Target-URI and a parseable
    * Content-Length, skips malformed tails. The version-line seek makes
    * the parser self-resynchronizing: a record with a garbled
    * Content-Length drops THAT record only, not the archive tail. */
  private[dedup] def rawRecords(raw: InputStream): Iterator[RawRec] = new Iterator[RawRec] {
    private val in = new BufferedInputStream(raw, 1 << 16)
    private var nextRec: RawRec = _
    private var done = false

    private def advance(): Unit = {
      while (nextRec == null && !done) {
        try {
          // seek the version line (tolerates stray CRLFs between records)
          var line = readLine(in)
          while (line != null && !line.startsWith("WARC/")) line = readLine(in)
          if (line == null) { done = true; return }
          var tpe: String = null; var uri: String = null
          var date: String = null; var len = -1L
          var h = readLine(in)
          while (h != null && h.nonEmpty) {
            val colon = h.indexOf(':')
            if (colon > 0) {
              val k = h.substring(0, colon).trim.toLowerCase
              val v = h.substring(colon + 1).trim
              k match {
                case "warc-type" => tpe = v
                case "warc-target-uri" =>
                  // some writers wrap the URI in <angle brackets>
                  uri = v.stripPrefix("<").stripSuffix(">")
                case "warc-date" => date = v
                case "content-length" =>
                  len = try v.toLong catch { case _: Exception => -1L }
                case _ =>
              }
            }
            h = readLine(in)
          }
          if (h == null) { done = true; return }
          if (len < 0) {
            // missing/garbled Content-Length: we cannot skip this block
            // exactly, but the outer version-line seek resyncs on the next
            // "WARC/" line — drop THIS record only, not the archive tail
            // (the documented malformed-records-are-skipped contract)
          } else {
            val block = readFully(in, len)
            // trailing CRLF CRLF separator (tolerated if absent at EOF)
            if (tpe != null && uri != null)
              nextRec = RawRec(tpe, uri, parseTs(date), block)
          }
        } catch {
          case _: EOFException => done = true // truncated tail: keep what we have
        }
      }
    }

    override def hasNext: Boolean = { advance(); nextRec != null }
    override def next(): RawRec = {
      advance()
      if (nextRec == null) throw new NoSuchElementException
      val r = nextRec; nextRec = null; r
    }
  }

  /** `WARC-Type: response` records only, HTTP body stripped — the
    * html-bearing record stream behind [[pages]]. */
  private[dedup] def records(raw: InputStream): Iterator[Rec] =
    rawRecords(raw).collect {
      case RawRec(tpe, url, ts, block) if tpe.equalsIgnoreCase("response") =>
        Rec(url, ts, httpBody(block))
    }

  private def isGzip(in: BufferedInputStream): Boolean = {
    in.mark(2)
    val a = in.read(); val b = in.read()
    in.reset()
    a == 0x1F && b == 0x8B
  }

  /** Buffered, gzip-sniffed stream over one archive (multi-member gzip
    * handled natively by GZIPInputStream). */
  private def openArchive(pds: org.apache.spark.input.PortableDataStream): InputStream = {
    val base = new BufferedInputStream(pds.open(), 1 << 16)
    if (isGzip(base)) new java.util.zip.GZIPInputStream(base, 1 << 16)
    else base
  }

  /** WARC archive(s) → page table. `path` accepts a file, directory, or
    * glob of `.warc` / `.warc.gz` files. */
  def pages(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
             else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(path, mp)
      .flatMap { case (_, pds) =>
        records(openArchive(pds)).map(r => Page(r.url, r.ts, r.html, null, null))
      }
      .toDS()
      .toDF()
  }

  /** WET archive(s) → page table with the TEXT column populated.
    *
    * WET is Common Crawl's pre-extracted-text companion format: the same
    * ISO 28500 container, but records are `WARC-Type: conversion` and the
    * block is the extracted UTF-8 text directly (no HTTP framing, nothing
    * to de-chunk). A corpus that arrives as WET skips `--extract-html`
    * entirely — this reader lands it straight in the
    * `(url, warc_ts, html=null, text, lang=null)` shape the pipeline's
    * text stages consume. Same streaming scale shape as [[pages]]: one
    * record's block in memory per task at a time.
    *
    * The per-file `warcinfo` header record (which has no Target-URI in
    * some writers, a metadata URI in others) is excluded by the
    * conversion-type filter, not by URI heuristics. */
  def wetPages(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
             else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(path, mp)
      .flatMap { case (_, pds) =>
        rawRecords(openArchive(pds)).collect {
          case RawRec(tpe, url, ts, block) if tpe.equalsIgnoreCase("conversion") =>
            Page(url, ts, null,
              new String(block, java.nio.charset.StandardCharsets.UTF_8), null)
        }
      }
      .toDS()
      .toDF()
  }

  /** WAT archive(s) → `(url, warc_ts, json)` metadata rows.
    *
    * WAT is Common Crawl's metadata companion: `WARC-Type: metadata`
    * records whose block is a JSON envelope (headers, link lists, title,
    * server fields) describing one record of the underlying WARC. The
    * JSON is returned VERBATIM as a string column — downstream parsing
    * belongs in Catalyst (`from_json` with the caller's schema of
    * interest, or `get_json_object` for point lookups), which keeps this
    * reader schema-agnostic across the several WAT envelope dialects in
    * the wild. Rows whose block is not a JSON object (defensive: some
    * writers emit text preambles) are dropped. */
  def watRecords(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
             else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(path, mp)
      .flatMap { case (_, pds) =>
        rawRecords(openArchive(pds)).collect {
          case RawRec(tpe, url, ts, block) if tpe.equalsIgnoreCase("metadata") =>
            (url, ts, new String(block, java.nio.charset.StandardCharsets.UTF_8).trim)
        }
      }
      .filter(_._3.startsWith("{"))
      .toDF("url", "warc_ts", "json")
  }
}

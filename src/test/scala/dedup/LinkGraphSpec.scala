package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class LinkGraphSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("links: quoted, single-quoted, unquoted hrefs in document order") {
    val html =
      """<a href="https://a.com/x">1</a>
        |<a class='y' href='https://b.com/y'>2</a>
        |<a href=https://c.com/z >3</a>""".stripMargin
    assert(HtmlExtract.links(html) ===
      Seq("https://a.com/x", "https://b.com/y", "https://c.com/z"))
  }

  test("links: entity decode, comments/script excluded, non-anchors ignored") {
    assert(HtmlExtract.links("""<a href="https://a.com/?x=1&amp;y=2">e</a>""") ===
      Seq("https://a.com/?x=1&y=2"))
    assert(HtmlExtract.links(
      """<!-- <a href="https://no.com/">c</a> -->
        |<script>var s = '<a href="https://also.no/">s</a>';</script>
        |<a href="https://yes.com/">y</a>""".stripMargin) === Seq("https://yes.com/"))
    // area/link/base tags are not <a>; data-href is not href; <abbr> is not <a >
    assert(HtmlExtract.links(
      """<link href="https://css.com/x.css"><a data-href="https://no.com/">t</a>
        |<abbr title="z">q</abbr><a href="/relative">r</a>""".stripMargin) ===
      Seq("/relative"))
    // anchor with no href, empty href, unclosed tag: never throws
    assert(HtmlExtract.links("<a name=top>x</a><a href=''>y</a><a href=\"https://t.co") ===
      Seq("https://t.co"))
    assert(HtmlExtract.links(null) === Seq.empty)
  }

  test("anchors: (href, text) pairs — entities, nested tags, edge cases") {
    // entity decode + whitespace collapse inside anchor text
    assert(HtmlExtract.anchors("""<a href="https://a.com/">hi &amp;  bye</a>""") ===
      Seq(("https://a.com/", "hi & bye")))
    // nested markup stripped; tag is a word boundary
    assert(HtmlExtract.anchors("""<a href='https://b.com/'> <b>bold</b> site </a>""") ===
      Seq(("https://b.com/", "bold site")))
    // </abbr> is not a close tag for <a>; real close ends the text
    assert(HtmlExtract.anchors("""<a href="https://c.com/">x <abbr>y</abbr> z</a>tail""") ===
      Seq(("https://c.com/", "x y z")))
    // a commented-out "</a>" inside the anchor does not end it
    assert(HtmlExtract.anchors("""<a href="https://d.com/">pre <!-- </a> --> post</a>""") ===
      Seq(("https://d.com/", "pre post")))
    // unclosed anchor runs to end of input; empty anchor text allowed
    assert(HtmlExtract.anchors("""<a href="https://e.com/">tail text""") ===
      Seq(("https://e.com/", "tail text")))
    assert(HtmlExtract.anchors("""<a href="https://f.com/"><img src="x"/></a>""") ===
      Seq(("https://f.com/", "")))
    // links() delegates: href sequence identical
    val html = """<a href="https://a.com/">1</a><a href=https://b.com/ >2</a>"""
    assert(HtmlExtract.links(html) === HtmlExtract.anchors(html).map(_._1))
    assert(HtmlExtract.anchors(null) === Seq.empty)
  }

  test("anchors: overlapping/nested anchors each close at the FIRST real close tag") {
    assert(HtmlExtract.anchors("<a href=a>one <a href=b>two</a> tail") ===
      Seq(("a", "one two"), ("b", "two")))
    // sequential anchors keep document order and their own texts
    assert(HtmlExtract.anchors("<a href=a>x</a> mid <a href=b>y</a>") ===
      Seq(("a", "x"), ("b", "y")))
  }

  test("anchors: adversarial pages stay linear — one pass, capped anchor text") {
    // 30k unclosed anchors: the old per-anchor close-tag lookahead made
    // this quadratic (each anchor rescanning to end of input) — a
    // multi-minute straggler from one malformed page. The single-pass
    // flush + raw-text cap must keep it well under seconds.
    val m = 30000
    val html = (0 until m).map(i => s"<a href=u$i>t$i ").mkString + ("pad " * 50)
    val t0 = System.nanoTime()
    val as = HtmlExtract.anchors(html)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(as.length === m)
    assert(as.head._1 === "u0" && as.last._1 === s"u${m - 1}")
    // every anchor is unclosed -> runs to end of input, capped: the first
    // anchor's text is a strict prefix of the page, not the whole page
    assert(as.head._2.length <= 4096)
    assert(sec < 10.0, f"anchors() took $sec%.1f s — quadratic scan regressed")
  }

  test("anchorTexts: per-destination-host rollup with deterministic top anchor") {
    import spark.implicits._
    val pages = Seq(
      // two links to d1 with the same anchor, one with another anchor
      ("https://s1.com/a",
        """<a href="https://d1.org/x">alpha</a><a href="https://d1.org/y">alpha</a>"""),
      ("https://s2.com/b",
        """<a href="https://d1.org/z">beta</a><a href="https://d2.net/q">gamma</a>"""),
      // empty anchor and self-host link are dropped
      ("https://s3.com/c",
        """<a href="https://d2.net/i"><img src="p"/></a>
          |<a href="https://s3.com/self">nav</a>
          |<a href="https://d2.net/j">delta</a>""".stripMargin))
      .toDF("url", "h")
      .select(col("url"), encode(col("h"), "UTF-8").as("html"))
    val out = LinkGraph.anchorTexts(pages)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out === Array(
      ("d1.org", 3L, 2L, "alpha"),   // alpha x2 beats beta x1
      ("d2.net", 2L, 2L, "delta"))) // gamma 1 = delta 1 -> lexicographic min
  }

  test("bestRepresentatives: quality argmax with min-id tie-break, map-side shape") {
    import spark.implicits._
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L), (9L, 9L))
      .toDF("id", "component")
    val scored = Seq((1L, 5), (2L, 9), (3L, 9), (7L, 2), (8L, 2), (9L, 4))
      .toDF("id", "quality")
    val out = FuzzyDedup.bestRepresentatives(assign, scored)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out === Array(
      (1L, 2L, 9.0, 3L), // quality 9 tie between 2 and 3 -> min id 2
      (7L, 7L, 2.0, 2L),
      (9L, 9L, 4.0, 1L)))
  }

  test("softWeights: 1/csize ppm per member, truncating division, partial-agg plan") {
    import spark.implicits._
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L), (9L, 9L))
      .toDF("id", "component")
    val out = FuzzyDedup.softWeights(assign)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out === Array(
      (1L, 1L, 3L, 333333L), // 1000000 DIV 3 truncates
      (2L, 1L, 3L, 333333L),
      (3L, 1L, 3L, 333333L),
      (7L, 7L, 2L, 500000L),
      (8L, 7L, 2L, 500000L),
      (9L, 9L, 1L, 1000000L)))
    // no window in the plan — the hot-cluster discipline
    val plan = {
      val o = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(o)) {
        FuzzyDedup.softWeights(assign).explain("formatted")
      }
      o.toString
    }
    assert(!plan.contains("Window") && plan.contains("HashAggregate"), plan)
  }

  test("pipeline --soft-weights: 1/csize ppm artifact beside the checkpoints") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("softw").toString
    val args = Pipeline.parse(Array("--synth", "300", "--output", dir, "--soft-weights"))
    val (_, assign) = Pipeline.run(spark, args)
    val w = spark.read.parquet(s"$dir/soft_weights")
    assert(w.count() === assign.count())
    // weights agree with the assignments' own cluster sizes
    val sizes = assign.groupBy("component").agg(count(lit(1)).as("n"))
    assert(w.join(sizes, "component").where(col("csize") =!= col("n")).count() === 0L)
    assert(w.where(col("weight_ppm") === 1000000L).count() > 0, "uniques weight 1.0")
    assert(w.where(col("csize") > 1).count() > 0, "synth corpus plants dup clusters")
  }

  test("hostEdges: distinct host pairs, relative/self/non-url dropped") {
    import spark.implicits._
    val pages = Seq(
      ("https://s1.com/p1",
        """<a href="https://d1.org/a">x</a><a href="https://d1.org/b">dup</a>
          |<a href="https://s1.com/self">self</a><a href="/rel">rel</a>
          |<a href="mailto:x@y.z">mail</a><a href="HTTPS://D2.net/c">case</a>""".stripMargin),
      ("https://s1.com/p2", """<a href="https://d1.org/c">same edge from p2</a>"""),
      ("https://s2.com/q", null.asInstanceOf[String]))
      .toDF("url", "h")
      .select(col("url"), encode(col("h"), "UTF-8").as("html"))
    val edges = LinkGraph.hostEdges(pages).as[(String, String)].collect().toSet
    assert(edges === Set(("s1.com", "d1.org"), ("s1.com", "d2.net")))
  }

  test("degrees + pageRankInt: hand-computed fixed-point ranks on a tiny graph") {
    import spark.implicits._
    // a -> b, a -> c, b -> c  (c dangling)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src_host", "dst_host")
    val deg = LinkGraph.degrees(edges).as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(deg === Map("a" -> ((2L, 0L)), "b" -> ((1L, 1L)), "c" -> ((0L, 2L))))

    // By hand, Unit1 = 1e6, base = 150000, damping 850:
    // iter1: contribs: b <- 1e6 div 2 = 500000; c <- 500000 + 1e6 = 1500000
    //   r1(a) = 150000
    //   r1(b) = 150000 + 850*500000  div 1000 = 150000 + 425000  = 575000
    //   r1(c) = 150000 + 850*1500000 div 1000 = 150000 + 1275000 = 1425000
    // iter2: contribs: b <- 150000 div 2 = 75000; c <- 75000 + 575000 = 650000
    //   r2(a) = 150000
    //   r2(b) = 150000 + 850*75000  div 1000 = 150000 + 63750  = 213750
    //   r2(c) = 150000 + 850*650000 div 1000 = 150000 + 552500 = 702500
    val r1 = LinkGraph.pageRankInt(edges, 1).as[(String, Long)].collect().toMap
    assert(r1 === Map("a" -> 150000L, "b" -> 575000L, "c" -> 1425000L))
    val r2 = LinkGraph.pageRankInt(edges, 2).as[(String, Long)].collect().toMap
    assert(r2 === Map("a" -> 150000L, "b" -> 213750L, "c" -> 702500L))
    // zero iterations: everyone at Unit1
    val r0 = LinkGraph.pageRankInt(edges, 0).as[(String, Long)].collect().toMap
    assert(r0 === Map("a" -> LinkGraph.Unit1, "b" -> LinkGraph.Unit1, "c" -> LinkGraph.Unit1))
  }

  test("pageRankInt: partition invariance (integer math has no order sensitivity)") {
    import spark.implicits._
    val edges = (0 until 200).map { i =>
      (s"s${i % 11}.com", s"d${(i * 7) % 13}.org")
    }.toDF("src_host", "dst_host").distinct()
    val a = LinkGraph.pageRankInt(edges.repartition(1), 3)
      .as[(String, Long)].collect().toMap
    val b = LinkGraph.pageRankInt(edges.repartition(17), 3)
      .as[(String, Long)].collect().toMap
    assert(a === b)
    // rank mass sanity: every vertex present, all ranks >= base
    assert(a.size === 24 && a.values.forall(_ >= 150000L))
  }
}

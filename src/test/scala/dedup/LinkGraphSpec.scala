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

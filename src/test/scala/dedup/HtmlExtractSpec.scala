package dedup

import org.scalatest.funsuite.AnyFunSuite

class HtmlExtractSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("tags stripped, text kept, tags act as word boundaries") {
    assert(HtmlExtract.text("<html><body><p>hello</p><p>world</p></body></html>")
      === "hello world")
    assert(HtmlExtract.text("<div class=\"x\">a</div><span>b</span>") === "a b")
    assert(HtmlExtract.text("no markup at all") === "no markup at all")
  }

  test("script/style/noscript content and comments are dropped entirely") {
    assert(HtmlExtract.text(
      "<p>keep</p><script>var x = '<p>evil</p>';</script><p>this</p>") === "keep this")
    assert(HtmlExtract.text("<style>p { color: red }</style>text") === "text")
    assert(HtmlExtract.text("<noscript><img src=x></noscript>ok") === "ok")
    assert(HtmlExtract.text("a<!-- hidden <b>bold</b> -->b") === "ab")
  }

  test("entities decode; unknown entities pass through") {
    assert(HtmlExtract.text("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;")
      === "a & b <c> \"d\" 'e'")
    assert(HtmlExtract.text("x&nbsp;y") === "x y")
    assert(HtmlExtract.text("&#65;&#x42;") === "AB")
    assert(HtmlExtract.text("fish &chips; here") === "fish &chips; here")
  }

  test("whitespace collapses; malformed markup never throws") {
    assert(HtmlExtract.text("  a \n\n  b\t c  ") === "a b c")
    assert(HtmlExtract.text("<p unclosed") === "")
    assert(HtmlExtract.text("<script>never closed") === "")
    assert(HtmlExtract.text("quoted '>' attr: <a title=\"a > b\">x</a>") ===
      "quoted '>' attr: x")
    assert(HtmlExtract.text(null) === "")
    assert(HtmlExtract.text("") === "")
  }

  test("extractColumn: html binary -> text column, distributed") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "<html><body>first page</body></html>".getBytes("UTF-8")),
      (2L, "<p>uses &amp; entities</p>".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = HtmlExtract.extractColumn(rows.toDF("id", "html"), "html")
      .select(col("id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "first page")
    assert(out(2L) === "uses & entities")
    assert(out(3L) === "")
  }

  test("supplementary-plane numeric entities decode as surrogate pairs everywhere") {
    // U+1F600 = &#128512; / &#x1F600; — one shared entityAt serves all three
    val emoji = new String(Character.toChars(0x1F600))
    assert(HtmlExtract.text("a &#128512; b") === s"a $emoji b")
    assert(HtmlExtract.text("&#x1F600;") === emoji)
    assert(HtmlExtract.links(s"""<a href="https://x.example/?e=&#128512;">l</a>""") ===
      Seq(s"https://x.example/?e=$emoji"))
    val prose = "Long enough body prose for the main-content length gate here"
    assert(HtmlExtract.mainContent(s"<p>$prose &#128512;</p>") === s"$prose $emoji")
    // invalid code point passes through undecoded, never throws
    assert(HtmlExtract.text("&#1114112;") === "&#1114112;")
  }

  test("mainContent: length gate, link-density gate, kept blocks joined by \\n") {
    val prose = "This paragraph carries enough ordinary prose to clear the " +
      "forty character minimum with ease."
    val html =
      s"""<html><body>
         |<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
         |<p>$prose</p>
         |<p>(c) 2026 short footer</p>
         |<div>Another long paragraph with one small <a href="/x">link</a> inside
         |enough surrounding words to stay under the density threshold.</div>
         |</body></html>""".stripMargin
    val got = HtmlExtract.mainContent(html)
    assert(got ===
      prose + "\n" +
      "Another long paragraph with one small link inside enough surrounding " +
      "words to stay under the density threshold.")
  }

  test("mainContent: link-dense long block dropped; thresholds are parameters") {
    // 5 anchors of prose-length text: density ~100% despite length >= 40
    val linkFarm = "<ul>" + (1 to 5).map(i =>
      s"""<li><a href="/$i">a fairly long anchor text number $i</a></li>""").mkString + "</ul>"
    assert(HtmlExtract.mainContent(linkFarm) === "")
    // each <li> is its own ~34-char block: at minBlockChars=10 the DENSITY
    // gate alone still drops them; disabling it (1000 permille) lets them by
    assert(HtmlExtract.mainContent(linkFarm, minBlockChars = 10) === "")
    assert(HtmlExtract.mainContent(linkFarm, minBlockChars = 10,
      maxLinkPermille = 1000).nonEmpty)
    // raising minBlockChars drops otherwise-kept prose
    val p = "<p>Twenty-nine chars of prose..</p>"
    assert(HtmlExtract.mainContent(p, minBlockChars = 10).nonEmpty)
    assert(HtmlExtract.mainContent(p, minBlockChars = 200) === "")
  }

  test("mainContent: script/comment excluded, anchors reset at block boundary, never throws") {
    val body = "Body prose long enough to clear the forty character gate easily."
    assert(HtmlExtract.mainContent(
      s"<script>var x='<p>no</p>';</script><p>$body</p><!-- <p>$body</p> -->") === body)
    // an unclosed <a> must not poison the NEXT block's density accounting
    assert(HtmlExtract.mainContent(
      s"""<p><a href="/x">dangling anchor$body</p><p>$body</p>""") === body)
    // adversarial markup: never throws
    assert(HtmlExtract.mainContent("<<<<>>>> <p <a & &#zz; </") != null)
    assert(HtmlExtract.mainContent(null) === "")
  }
}

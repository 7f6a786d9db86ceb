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
}

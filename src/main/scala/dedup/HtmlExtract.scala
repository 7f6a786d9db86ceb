package dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction: the source-prep step for corpora that arrive
  * as raw crawl HTML without a text column.
  *
  * IMPORTANT north-rule boundary: the reference never parses HTML — its
  * inputs already carry extracted text, and the flagship pipeline here
  * consumes the `text` column VERBATIM (byte-identical per url,
  * SURVEY.md §1). This operator exists for the step BEFORE that contract:
  * producing a text column from the page table's `html: binary` payload
  * when none exists. It is never applied inside the dedup pipeline.
  *
  * Extraction contract (deterministic, whitespace-normalized):
  *   - `<script>`/`<style>`/`<noscript>` elements and `<!-- -->` comments
  *     are dropped entirely (content included);
  *   - every other tag is removed; text nodes are kept;
  *   - the five named entities (&amp; &lt; &gt; &quot; &#39;/&apos;) and
  *     numeric `&#NN;`/`&#xHH;` references are decoded; `&nbsp;` → space;
  *   - all whitespace runs collapse to one space, result is trimmed.
  *
  * Single-pass hand-rolled scanner (no regex backtracking on adversarial
  * markup, no external parser): O(len), allocation = one StringBuilder.
  * Malformed HTML never throws — an unclosed tag consumes to end of input.
  */
object HtmlExtract {

  /** Decode the entity starting at `s(i) == '&'` → (decoded string or
    * null, chars consumed). ONE shared implementation for text()/links()/
    * mainContent() so the three extractors can never disagree; numeric
    * references above U+FFFF decode via Character.toChars (surrogate
    * pairs), invalid code points pass through undecoded. */
  private def entityAt(s: String, i: Int, n: Int): (String, Int) = {
    var k = i + 1
    val lim = math.min(n, i + 10)
    while (k < lim && s.charAt(k) != ';') k += 1
    if (k >= lim) return (null, 1)
    val ent = s.substring(i + 1, k)
    def cp(v: Int): String =
      if (Character.isValidCodePoint(v)) new String(Character.toChars(v)) else null
    val dec: String = ent.toLowerCase match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
        try cp(Integer.parseInt(ent.substring(2), 16))
        catch { case _: Exception => null }
      case _ if ent.startsWith("#") =>
        try cp(Integer.parseInt(ent.substring(1)))
        catch { case _: Exception => null }
      case _ => null
    }
    if (dec == null) (null, 1) else (dec, k + 1 - i)
  }

  def text(html: String): String = {
    if (html == null) return ""
    val n = html.length
    val sb = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    var lastSpace = true // suppress leading/duplicate whitespace

    def appendChar(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (!lastSpace) { sb.append(' '); lastSpace = true }
      } else { sb.append(c); lastSpace = false }
    }

    def startsWithIgnoreCase(at: Int, s: String): Boolean = {
      if (at + s.length > n) return false
      var k = 0
      while (k < s.length) {
        if (Character.toLowerCase(html.charAt(at + k)) != s.charAt(k)) return false
        k += 1
      }
      true
    }

    /** index just past the matching `</name…>`, or n if unclosed. */
    def skipElement(at: Int, name: String): Int = {
      var j = at
      val close = "</" + name
      while (j < n) {
        if (html.charAt(j) == '<' && startsWithIgnoreCase(j, close)) {
          var k = j + close.length
          while (k < n && html.charAt(k) != '>') k += 1
          return math.min(k + 1, n)
        }
        j += 1
      }
      n
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (startsWithIgnoreCase(i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (startsWithIgnoreCase(i, "<script")) {
          i = skipElement(i + 7, "script"); appendChar(' ')
        } else if (startsWithIgnoreCase(i, "<style")) {
          i = skipElement(i + 6, "style"); appendChar(' ')
        } else if (startsWithIgnoreCase(i, "<noscript")) {
          i = skipElement(i + 9, "noscript"); appendChar(' ')
        } else {
          // any other tag: skip to '>', honoring quoted attribute values
          var j = i + 1
          var quote: Char = 0
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val cj = html.charAt(j)
            if (quote == 0 && (cj == '"' || cj == '\'')) quote = cj
            else if (cj == quote) quote = 0
            j += 1
          }
          i = math.min(j + 1, n)
          appendChar(' ') // tags are word boundaries: <p>a</p><p>b</p> -> "a b"
        }
      } else if (c == '&') {
        val (dec, adv) = entityAt(html, i, n)
        if (dec == null) { appendChar(c); i += 1 }
        else { dec.foreach(appendChar); i += adv }
      } else {
        appendChar(c)
        i += 1
      }
    }
    // trailing space from the collapse pass
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
    sb.substring(0, end)
  }

  /** Decode the [[entityAt]] entity set in an attribute value (URLs in
    * href routinely carry &amp;). Unknown entities pass through. */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val (dec, adv) = entityAt(s, i, n)
        if (dec == null) { sb.append(c); i += 1 }
        else { sb.append(dec); i += adv }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** All `<a href=…>` targets in document order — the outlink half of a
    * crawl link graph. Same single-pass no-regex discipline as [[text]]:
    * case-insensitive tag/attribute match, quoted ('/") and unquoted
    * attribute values, entity-decoded (&amp; inside URLs), skips script/
    * style/comment content (a commented-out anchor is not a link).
    * Malformed markup never throws. */
  def links(html: String): Seq[String] = anchors(html).map(_._1)

  /** Raw-markup cap on the content scanned for ONE anchor's text: bounds
    * total anchor-text work to O(anchors · cap) even on adversarial pages
    * (10⁵ unclosed anchors would otherwise each extract to end-of-input —
    * a quadratic straggler from one bad page). 4 KB of markup is far past
    * any real display text. */
  private val AnchorTextCap = 4096

  /** `<a href=…>` targets WITH their anchor text, in document order —
    * (href, text). Anchor text is the [[text]]-extraction of the content
    * between the opening tag and its first real `</a>` (comments,
    * script/style bodies, and attribute values are not close-tag
    * positions), so nested markup is stripped, entities decode, and
    * whitespace collapses exactly as in page text; an unclosed anchor
    * runs to end of input (raw content capped at [[AnchorTextCap]]).
    * Overlapping/nested anchors are each still reported: an open tag
    * registers a PENDING anchor and the single forward pass flushes every
    * pending anchor at the next real close — O(page) scanning total, no
    * per-anchor lookahead.
    *
    * Anchor text is the classic aggregated description signal for a
    * target page (how the web refers to it) — [[LinkGraph.anchorTexts]]
    * aggregates these per destination host. */
  def anchors(html: String): Seq[(String, String)] = {
    if (html == null) return Seq.empty
    val n = html.length
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    // (href, contentStart) of anchors whose close tag hasn't been reached
    val pending = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    def flush(closeAt: Int): Unit = {
      var p = 0
      while (p < pending.length) {
        val (href, cs) = pending(p)
        val end = math.min(closeAt, math.min(n, cs + AnchorTextCap))
        out += ((href, text(html.substring(cs, math.max(cs, end)))))
        p += 1
      }
      pending.clear()
    }
    var i = 0
    def startsWithIgnoreCase(at: Int, s: String): Boolean = {
      if (at + s.length > n) return false
      var k = 0
      while (k < s.length) {
        if (Character.toLowerCase(html.charAt(at + k)) != s.charAt(k)) return false
        k += 1
      }
      true
    }
    def skipPast(at: Int, close: String): Int = {
      var j = at
      while (j < n) {
        if (html.charAt(j) == '<' && startsWithIgnoreCase(j, close)) {
          var k = j + close.length
          while (k < n && html.charAt(k) != '>') k += 1
          return math.min(k + 1, n)
        }
        j += 1
      }
      n
    }
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (startsWithIgnoreCase(i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (startsWithIgnoreCase(i, "<script")) i = skipPast(i + 7, "</script")
        else if (startsWithIgnoreCase(i, "<style")) i = skipPast(i + 6, "</style")
        else if (startsWithIgnoreCase(i, "<a") && i + 2 < n &&
                 (Character.isWhitespace(html.charAt(i + 2)) || html.charAt(i + 2) == '>')) {
          // scan attributes inside this tag for href=
          var j = i + 2
          var quote: Char = 0
          var href: String = null
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val cj = html.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0; j += 1 }
            else if (cj == '"' || cj == '\'') { quote = cj; j += 1 }
            else if (href == null && startsWithIgnoreCase(j, "href") &&
                     (j == i + 2 || (!Character.isLetterOrDigit(html.charAt(j - 1)) &&
                                     html.charAt(j - 1) != '-'))) { // not data-href etc.
              var k = j + 4
              while (k < n && Character.isWhitespace(html.charAt(k))) k += 1
              if (k < n && html.charAt(k) == '=') {
                k += 1
                while (k < n && Character.isWhitespace(html.charAt(k))) k += 1
                if (k < n && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
                  val q = html.charAt(k)
                  val e = html.indexOf(q, k + 1)
                  href = if (e < 0) html.substring(k + 1) else html.substring(k + 1, e)
                  j = if (e < 0) n else e + 1
                } else { // unquoted value: runs to whitespace or '>'
                  var e = k
                  while (e < n && !Character.isWhitespace(html.charAt(e)) && html.charAt(e) != '>') e += 1
                  href = html.substring(k, e)
                  j = e
                }
              } else j = k
            } else j += 1
          }
          val v = if (href == null) null else decodeEntities(href.trim)
          // register a pending anchor; its text is emitted when the main
          // pass reaches the next real close tag (or end of input)
          if (v != null && v.nonEmpty) pending += ((v, math.min(j + 1, n)))
          i = math.min(j + 1, n)
        } else if (startsWithIgnoreCase(i, "</a") &&
                   (i + 3 >= n || html.charAt(i + 3) == '>' ||
                    Character.isWhitespace(html.charAt(i + 3)))) {
          // a real close tag at a tag boundary (not </abbr>): every
          // pending anchor opened before it closes here — first-close
          // semantics for each, one forward pass for all
          flush(i)
          var j = i + 1
          while (j < n && html.charAt(j) != '>') j += 1
          i = math.min(j + 1, n)
        } else {
          var j = i + 1
          var quote: Char = 0
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val cj = html.charAt(j)
            if (quote == 0 && (cj == '"' || cj == '\'')) quote = cj
            else if (cj == quote) quote = 0
            j += 1
          }
          i = math.min(j + 1, n)
        }
      } else i += 1
    }
    flush(n) // unclosed anchors run to end of input
    out.toSeq
  }

  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "td", "th", "tr", "table", "section", "article", "header", "footer",
    "nav", "aside", "blockquote", "pre", "br", "form", "body", "html")

  /** jusText-style MAIN-CONTENT extraction: split the page into blocks at
    * block-level tag boundaries, keep a block iff it is long enough
    * (≥ `minBlockChars` after whitespace collapse) AND not link-dominated
    * (anchor-text chars · 1000 ≤ block chars · `maxLinkPermille`) — the
    * two-signal core of the jusText/boilerpipe family (Pomikálek 2011):
    * navigation, footers, and link farms are short or link-dense; body
    * prose is neither. Kept blocks join with '\n'.
    *
    * Same single-pass scanner discipline as [[text]] (script/style/
    * comment exclusion, entity decode, whitespace collapse, never
    * throws); integer-exact link-density predicate (no float threshold).
    * This is SOURCE PREP like [[text]] — never applied inside the dedup
    * flagship (text-verbatim invariant, SURVEY.md §1). */
  def mainContent(html: String, minBlockChars: Int = 40, maxLinkPermille: Int = 300): String = {
    if (html == null) return ""
    val n = html.length
    val out = new java.lang.StringBuilder()
    val block = new java.lang.StringBuilder()
    var anchorChars = 0
    var anchorDepth = 0
    var lastSpace = true
    var i = 0

    def startsWithIgnoreCase(at: Int, s: String): Boolean = {
      if (at + s.length > n) return false
      var k = 0
      while (k < s.length) {
        if (Character.toLowerCase(html.charAt(at + k)) != s.charAt(k)) return false
        k += 1
      }
      true
    }
    def skipElement(at: Int, name: String): Int = {
      var j = at
      val close = "</" + name
      while (j < n) {
        if (html.charAt(j) == '<' && startsWithIgnoreCase(j, close)) {
          var k = j + close.length
          while (k < n && html.charAt(k) != '>') k += 1
          return math.min(k + 1, n)
        }
        j += 1
      }
      n
    }
    def appendChar(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (!lastSpace) { block.append(' '); lastSpace = true }
      } else {
        block.append(c)
        if (anchorDepth > 0) anchorChars += 1
        lastSpace = false
      }
    }
    def flush(): Unit = {
      var end = block.length
      while (end > 0 && block.charAt(end - 1) == ' ') end -= 1
      var start = 0
      while (start < end && block.charAt(start) == ' ') start += 1
      val len = end - start
      if (len >= minBlockChars && anchorChars.toLong * 1000L <= len.toLong * maxLinkPermille) {
        if (out.length > 0) out.append('\n')
        out.append(block, start, end)
      }
      block.setLength(0)
      anchorChars = 0
      lastSpace = true
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (startsWithIgnoreCase(i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (startsWithIgnoreCase(i, "<script")) i = skipElement(i + 7, "script")
        else if (startsWithIgnoreCase(i, "<style")) i = skipElement(i + 6, "style")
        else if (startsWithIgnoreCase(i, "<noscript")) i = skipElement(i + 9, "noscript")
        else {
          // read the tag name (after optional '/')
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // skip to tag end, honoring quoted attribute values
          var quote: Char = 0
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val cj = html.charAt(j)
            if (quote == 0 && (cj == '"' || cj == '\'')) quote = cj
            else if (cj == quote) quote = 0
            j += 1
          }
          i = math.min(j + 1, n)
          if (name == "a") {
            if (closing) anchorDepth = math.max(0, anchorDepth - 1)
            else anchorDepth += 1
            appendChar(' ') // tags are word boundaries
          } else if (BlockTags.contains(name)) {
            flush()
            anchorDepth = 0 // block boundary terminates any dangling anchor
          } else appendChar(' ')
        }
      } else if (c == '&') {
        val (dec, adv) = entityAt(html, i, n)
        if (dec == null) { appendChar(c); i += 1 }
        else { dec.foreach(appendChar); i += adv }
      } else {
        appendChar(c)
        i += 1
      }
    }
    flush()
    out.toString
  }

  /** Column form of [[mainContent]] over an html STRING column — same
    * JVM-closure justification as [[extractColumn]]; narrow, no shuffle. */
  def mainContentCol(html: Column, minBlockChars: Int = 40,
      maxLinkPermille: Int = 300): Column = {
    val fn = udf((s: String) => mainContent(s, minBlockChars, maxLinkPermille))
    fn(html)
  }

  /** html binary column (UTF-8) → extracted text column. A JVM closure is
    * the right tool here (a stateful scanner has no Catalyst spelling);
    * narrow projection, no shuffle. */
  def extractColumn(df: DataFrame, htmlCol: String, out: String = "text"): DataFrame = {
    val fn = udf { (bytes: Array[Byte]) =>
      if (bytes == null) ""
      else text(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    }
    df.withColumn(out, fn(col(htmlCol)))
  }
}

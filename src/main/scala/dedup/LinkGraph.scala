package dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-level crawl link graph + an integer fixed-point PageRank — the
  * URL-level quality signal large webtext curation pipelines attach to
  * pages (link-based ranking is a standard page-quality prior alongside
  * the text-level Gopher/C4/CCNet gates in `TextAnalysis`).
  *
  * The reference has no link stage (its inputs are already flat text
  * tables — SURVEY.md §1); this is a value-add operator in the same class
  * as `UrlOps`/`HtmlExtract`: source-prep over the page table's own
  * `url`/`html` columns, never inside the dedup flagship.
  *
  * Design for 10^12 pages:
  *   - edges are DISTINCT (src_host, dst_host) pairs — bounded by host
  *     fan-out, orders of magnitude smaller than page count; built with
  *     one flatMap (the [[HtmlExtract.links]] scanner) + one distinct
  *     shuffle.
  *   - rank iterations are (join on src) + (sum by dst): the hot-dst skew
  *     case (every host links to a few giants) is absorbed by partial
  *     aggregation (sum combines map-side); the join keys both sides by
  *     host with AQE skew-split as the backstop. No driver-side state,
  *     no Pregel messages, no broadcast of O(V) rank vectors.
  *   - each iteration `localCheckpoint`s to truncate lineage, the same
  *     discipline as [[ConnectedComponents]].
  *
  * EXACTNESS: ranks are integer fixed-point (1e6 = rank 1.0) and every
  * step is integer arithmetic — `r/outdeg` truncating division per edge,
  * integer sums (order-independent), `base + damping·sum/1000` per
  * vertex. A SQL engine replaying the same unrolled iterations reproduces
  * the ranks BIT-EXACTLY, which float PageRank cannot promise under
  * reordered summation; that is what makes q_pagerank a hard oracle row
  * rather than a tolerance check. Dangling mass (hosts with no outlinks)
  * is dropped, the classic simplification; ranks are a relative signal.
  */
object LinkGraph {

  val Unit1: Long = 1000000L // fixed-point 1.0

  /** Absolute http(s) outlinks of each page, as one typed flatMap —
    * (url, link) rows, relative links dropped (resolution needs a base-url
    * join that adds nothing to a host-level graph). */
  def outlinks(pages: DataFrame, urlCol: String = "url", htmlCol: String = "html"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col(urlCol).cast("string").as("url"), col(htmlCol).as("html"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, html) =>
        if (html == null) Iterator.empty
        else {
          val doc = new String(html, java.nio.charset.StandardCharsets.UTF_8)
          HtmlExtract.links(doc).iterator.filter { l =>
            val lo = l.toLowerCase
            lo.startsWith("http://") || lo.startsWith("https://")
          }.map(l => (url, l))
        }
      }
      .toDF("url", "link")
  }

  /** Per-link anchor text rows (url, link, anchor) — absolute http(s)
    * links only, same filter as [[outlinks]]; `anchor` is the
    * [[HtmlExtract.anchors]] text (may be "" for image/icon links). One
    * typed flatMap, no shuffle — aggregation is the caller's choice
    * ([[anchorTexts]] gives the standard per-destination-host rollup). */
  def outlinkAnchors(pages: DataFrame, urlCol: String = "url", htmlCol: String = "html"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col(urlCol).cast("string").as("url"), col(htmlCol).as("html"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, html) =>
        if (html == null) Iterator.empty
        else {
          val doc = new String(html, java.nio.charset.StandardCharsets.UTF_8)
          HtmlExtract.anchors(doc).iterator.filter { case (l, _) =>
            val lo = l.toLowerCase
            lo.startsWith("http://") || lo.startsWith("https://")
          }.map { case (l, a) => (url, l, a) }
        }
      }
      .toDF("url", "link", "anchor")
  }

  /** Aggregated anchor-text signal per DESTINATION host — how the rest of
    * the web describes a site. The training-data use: anchor strings are
    * query-like page descriptions (title/query supervision pairs), and
    * anchor diversity is a page-quality prior alongside [[pageRankInt]].
    *
    * Output: (host, n_links, n_anchors, top_anchor) where n_links counts
    * inbound cross-host link rows with non-empty anchor text, n_anchors
    * counts distinct anchor strings, and top_anchor is the most frequent
    * anchor (ties broken lexicographically — deterministic). Scale shape:
    * one partial-agg groupBy on (dst_host, anchor) — never a per-host
    * collect; the hot-giant-site key is absorbed map-side, and top-1
    * selection is a max_by over the (host, anchor) counts, not a window
    * over raw links. */
  def anchorTexts(pages: DataFrame, urlCol: String = "url", htmlCol: String = "html"): DataFrame = {
    val raw = outlinkAnchors(pages, urlCol, htmlCol)
      .select(UrlOps.host(col("url")).as("src_host"),
        UrlOps.host(col("link")).as("dst_host"),
        col("anchor"))
      .where(col("src_host") =!= "" && col("dst_host") =!= "" &&
             col("src_host") =!= col("dst_host") && col("anchor") =!= "")
    val perAnchor = raw.groupBy(col("dst_host").as("host"), col("anchor"))
      .agg(count(lit(1)).as("cnt"))
    perAnchor.groupBy("host")
      .agg(sum(col("cnt")).as("n_links"),
        count(lit(1)).as("n_anchors"),
        // max of (cnt, reversed-anchor-rank) = most frequent, ties -> the
        // lexicographically SMALLEST anchor: max_by on (cnt asc, anchor
        // desc) inverted via min_by over struct(-cnt, anchor)
        min_by(col("anchor"), struct((-col("cnt")).as("nc"), col("anchor"))).as("top_anchor"))
  }

  /** Distinct (src_host, dst_host) edges of the host graph; self-loops
    * (intra-host navigation) dropped — they add rank mass nowhere. */
  def hostEdges(pages: DataFrame, urlCol: String = "url", htmlCol: String = "html"): DataFrame = {
    val raw = outlinks(pages, urlCol, htmlCol)
    raw.select(
        UrlOps.host(col("url")).as("src_host"),
        UrlOps.host(col("link")).as("dst_host"))
      .where(col("src_host") =!= "" && col("dst_host") =!= "" &&
             col("src_host") =!= col("dst_host")) // UrlOps.host: "" = non-URL
      .distinct()
  }

  /** Per-host out/in degree over the distinct edge set. */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src_host").as("host"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst_host").as("host"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("host"), "full_outer")
      .select(col("host"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Integer fixed-point PageRank over the host edge set.
    *
    * r₀(v) = 1e6 for every vertex; each iteration
    *   r'(v) = (1000 − damping)·1000  +  damping · Σ_{u→v} (r(u) div out(u)) div 1000
    * with all divisions truncating (operands are non-negative, so this is
    * floor division in any SQL dialect). `dampingPerMille` = 850 is the
    * classic 0.85. Returns (host, rank) for every vertex of the graph.
    */
  def pageRankInt(edges: DataFrame, iterations: Int, dampingPerMille: Int = 850): DataFrame = {
    require(iterations >= 0 && dampingPerMille >= 0 && dampingPerMille <= 1000)
    val e = edges.select(col("src_host"), col("dst_host")).localCheckpoint()
    val vertices = e.select(col("src_host").as("host"))
      .union(e.select(col("dst_host").as("host")))
      .distinct()
      .localCheckpoint()
    val outDeg = e.groupBy(col("src_host").as("host"))
      .agg(count(lit(1)).as("out_deg"))
      .localCheckpoint()
    val base = (1000L - dampingPerMille) * 1000L
    var ranks = vertices.select(col("host"), lit(Unit1).as("r"))
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("host", "src_host"), Seq("src_host"))
        .join(outDeg.withColumnRenamed("host", "src_host"), Seq("src_host"))
        .select(col("dst_host").as("host"),
          expr("r div out_deg").as("c"))
        .groupBy("host").agg(sum(col("c")).as("s"))
      ranks = vertices
        .join(contribs, Seq("host"), "left")
        .select(col("host"),
          (lit(base) + expr(s"$dampingPerMille * coalesce(s, 0L) div 1000")).as("r"))
        .localCheckpoint()
      i += 1
    }
    ranks.select(col("host"), col("r").as("rank"))
  }
}

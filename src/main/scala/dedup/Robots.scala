package dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) evaluation — the crawl-pipeline
  * gate the reference corpus implies but never implements: a Common-Crawl
  * style pipeline that redistributes page text should be able to drop
  * pages its operator's crawler would not have been allowed to fetch.
  *
  * Implemented semantics (RFC 9309 §2):
  *   - group selection: the group(s) whose `User-agent:` product token is
  *     the LONGEST case-insensitive prefix of the crawler's token win;
  *     `*` groups are the fallback; multiple groups with the winning
  *     token MERGE (§2.2.1);
  *   - rule matching: `Allow`/`Disallow` values match as path prefixes
  *     with `*` (any sequence) and `$` (end anchor) wildcards (§2.2.3);
  *   - decision: the LONGEST matching pattern wins; on a length tie,
  *     Allow wins (§2.2.2); no matching rule, no matching group, or a
  *     missing/unparseable robots.txt ⇒ allowed (fail-open, §2.3.1.2-4);
  *   - an empty `Disallow:` value is a no-op rule (classic "allow all").
  *
  * Not implemented (documented): percent-encoding normalization of rule
  * paths and the 500 KiB parse cap — both one projection away, neither
  * changes the operator shape.
  *
  * Scale shape: robots.txt is parsed ONCE per host (the robots table is
  * O(hosts), orders of magnitude smaller than the corpus), rules ride a
  * host-keyed equi-join onto the pages (broadcast when small, AQE
  * otherwise — the build side is one row per host, so a 10⁹-page host
  * skews only the probe side, which AQE splits), and the per-page
  * decision is a zero-extra-shuffle typed evaluation.
  */
object Robots {

  /** One Allow/Disallow rule; `pattern` as written (after trimming). */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse `robotsTxt` and return the merged rule list of the group(s)
    * selected for `agent` per RFC 9309 §2.2.1. Empty when no group
    * matches (⇒ everything allowed). Null-safe. */
  def rulesFor(robotsTxt: String, agent: String): Seq[Rule] = {
    if (robotsTxt == null) return Nil
    val me = agent.toLowerCase(java.util.Locale.ROOT)
    // groups: consecutive user-agent lines share the rule block below them
    val groups = scala.collection.mutable.ArrayBuffer[(String, scala.collection.mutable.ArrayBuffer[Rule])]()
    var currentAgents: List[String] = Nil
    var inRules = false
    robotsTxt.split("\r?\n").foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i => raw.substring(0, i).trim
      }
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { currentAgents = Nil; inRules = false }
            val tok = value.toLowerCase(java.util.Locale.ROOT)
            currentAgents = tok :: currentAgents
            groups += ((tok, scala.collection.mutable.ArrayBuffer.empty[Rule]))
          case "allow" | "disallow" =>
            inRules = true
            if (value.nonEmpty && currentAgents.nonEmpty) {
              val r = Rule(key == "allow", value)
              groups.foreach { case (tok, rules) =>
                if (currentAgents.contains(tok) && !rules.contains(r)) rules += r
              }
            }
          case _ => // crawl-delay, sitemap, unknown: ignored (spec: MAY)
        }
      }
    }
    // longest UA token that is a prefix of our token; '*' as fallback
    val tokens = groups.map(_._1).distinct
    val best = tokens.filter(t => t != "*" && me.startsWith(t)).sortBy(-_.length).headOption
      .orElse(if (tokens.contains("*")) Some("*") else None)
    best match {
      case None => Nil
      case Some(tok) => groups.filter(_._1 == tok).flatMap(_._2).toSeq.distinct
    }
  }

  /** RFC 9309 §2.2.3 pattern match against a path: literal prefix with
    * `*` (any char sequence, including empty) and a trailing `$` end
    * anchor. Two-pointer greedy matcher with backtracking — O(n·m) worst
    * case, linear in practice. */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var pi = 0; var si = 0
    var starPi = -1; var starSi = -1
    while (si < path.length) {
      if (pi < p.length && p.charAt(pi) == '*') { starPi = pi; starSi = si; pi += 1 }
      else if (pi < p.length && p.charAt(pi) == path.charAt(si)) { pi += 1; si += 1 }
      else if (starPi >= 0) { starSi += 1; si = starSi; pi = starPi + 1 }
      else return false
      if (pi == p.length) {
        // pattern exhausted: prefix match unless anchored at the end
        if (!anchored) return true
        if (si == path.length) return true
        // anchored: try to push the last '*' further, if any
        if (starPi < 0) return false
        starSi += 1; si = starSi; pi = starPi + 1
      }
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length
  }

  /** §2.2.2 decision: the longest matching pattern wins; ties go to
    * Allow; nothing matches ⇒ allowed. */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (r.pattern.length >= bestLen && matches(r.pattern, path)) {
        if (r.pattern.length > bestLen) { bestLen = r.pattern.length; bestAllow = r.allow }
        else if (r.allow) bestAllow = true // tie → Allow
      }
    }
    bestAllow
  }

  /** Per-page robots decision over a corpus: `pages` (with `urlCol`) ×
    * `robots` (hostCol, txtCol — one robots.txt per host), evaluated for
    * `agent`. Output = pages + (host, path, robots_allowed). Hosts with
    * no robots row are allowed (fail-open). One host-keyed equi-join;
    * rules are parsed once per HOST, not once per page. */
  def decide(
      pages: DataFrame,
      urlCol: String,
      robots: DataFrame,
      hostCol: String,
      txtCol: String,
      agent: String): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val parsed = robots
      .select(col(hostCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .map { case (h, txt) =>
        (h, rulesFor(txt, agent).map(r => (r.allow, r.pattern)))
      }
      .toDF("__rhost", "__rules")
    val withPath = pages
      .withColumn("host", UrlOps.host(col(urlCol)))
      .withColumn("path",
        coalesce(nullif(regexp_extract(col(urlCol),
          "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1), lit("")), lit("/")))
    withPath
      .join(parsed, withPath("host") === parsed("__rhost"), "left")
      .drop("__rhost")
      .withColumn("robots_allowed", udfAllowed(col("__rules"), col("path")))
      .drop("__rules")
  }

  /** Keep only the pages the crawler may fetch. */
  def filterAllowed(
      pages: DataFrame,
      urlCol: String,
      robots: DataFrame,
      hostCol: String,
      txtCol: String,
      agent: String): DataFrame =
    decide(pages, urlCol, robots, hostCol, txtCol, agent)
      .where(col("robots_allowed"))
      .drop("host", "path", "robots_allowed")

  // the one UDF in the family: the rule evaluation walks a tiny
  // per-host array with a backtracking matcher — not expressible as a
  // Catalyst higher-order function without regex round-trips (which
  // would re-introduce per-row pattern compilation, the exact cost this
  // operator exists to avoid)
  private val udfAllowed =
    udf((rules: Seq[org.apache.spark.sql.Row], path: String) => {
      if (rules == null) true
      else allowed(rules.map(r => Rule(r.getBoolean(0), r.getString(1))),
        if (path == null) "/" else path)
    })
}

package dedup

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 robots evaluation gates: the pattern matcher is brute-forced
  * against an independent regex translation, group selection and the
  * longest-match/tie rules are pinned to the RFC's own examples, and the
  * distributed decide() is checked on a hand-built corpus. */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("pattern matching: RFC wildcard/anchor semantics, brute-forced vs regex") {
    // spec landmarks (§2.2.3 / §5.2 examples)
    assert(Robots.matches("/fish", "/fish"))
    assert(Robots.matches("/fish", "/fish.html"))
    assert(Robots.matches("/fish", "/fishheads/yummy.html"))
    assert(!Robots.matches("/fish", "/Fish.asp")) // case-sensitive
    assert(!Robots.matches("/fish", "/catfish"))
    assert(Robots.matches("/fish*", "/fishheads"))
    assert(Robots.matches("/fish/", "/fish/salmon.html"))
    assert(!Robots.matches("/fish/", "/fish"))
    assert(Robots.matches("/*.php", "/index.php"))
    assert(Robots.matches("/*.php", "/folder/any.php.file.html"))
    assert(!Robots.matches("/*.php", "/windows.PHP"))
    assert(Robots.matches("/*.php$", "/filename.php"))
    assert(!Robots.matches("/*.php$", "/filename.php?parameters"))
    assert(Robots.matches("/fish*.php", "/fish.php"))
    assert(Robots.matches("/fish*.php", "/fishheads/catfish.php?parameters"))
    // trailing star + anchor
    assert(Robots.matches("/x*$", "/xyz"))
    assert(Robots.matches("/*", "/anything"))
    assert(Robots.matches("/", "/"))

    // brute force vs an independent regex translation
    def regexMatch(pattern: String, path: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val body = (if (anchored) pattern.dropRight(1) else pattern)
        .flatMap(c => if (c == '*') ".*" else java.util.regex.Pattern.quote(c.toString))
      val m = java.util.regex.Pattern.compile("^" + body + (if (anchored) "$" else ""))
        .matcher(path)
      if (anchored) m.matches() else m.lookingAt()
    }
    val rnd = new scala.util.Random(11)
    val chars = "/ab*."
    for (trial <- 0 until 300) {
      val pat = "/" + Array.fill(rnd.nextInt(6))(chars(rnd.nextInt(chars.length))).mkString +
        (if (rnd.nextBoolean()) "$" else "")
      val path = "/" + Array.fill(rnd.nextInt(8))("/ab.".charAt(rnd.nextInt(4))).mkString
      assert(Robots.matches(pat, path) === regexMatch(pat, path),
        s"trial $trial pattern=$pat path=$path")
    }
  }

  test("group selection: longest UA prefix wins, * fallback, groups merge") {
    val txt =
      """# robots
        |User-agent: *
        |Disallow: /star
        |
        |User-agent: graftbot
        |Disallow: /bot
        |
        |User-agent: graftbot-news
        |Disallow: /news
        |
        |User-agent: graftbot
        |Disallow: /bot2
        |""".stripMargin
    // exact token: the two graftbot groups MERGE; '*' group ignored
    assert(Robots.rulesFor(txt, "graftbot").map(_.pattern).toSet === Set("/bot", "/bot2"))
    // longer crawler token still prefix-matches the shorter group token;
    // the longest matching token wins (graftbot-news over graftbot)
    assert(Robots.rulesFor(txt, "graftbot-news").map(_.pattern) === Seq("/news"))
    // unrelated crawler falls back to *
    assert(Robots.rulesFor(txt, "otherbot").map(_.pattern) === Seq("/star"))
    // case-insensitive tokens
    assert(Robots.rulesFor("User-Agent: GraftBot\nDisallow: /x", "graftbot")
      .map(_.pattern) === Seq("/x"))
    // no matching group and no * ⇒ no rules ⇒ everything allowed
    assert(Robots.rulesFor("User-agent: a\nDisallow: /x", "b") === Nil)
    // empty Disallow is a no-op rule
    assert(Robots.rulesFor("User-agent: *\nDisallow:", "any") === Nil)
    assert(Robots.rulesFor(null, "any") === Nil)
  }

  test("decision: longest match wins, tie goes to Allow, no match allows") {
    val rules = Seq(
      Robots.Rule(allow = false, "/priv"),
      Robots.Rule(allow = true, "/priv/ok"))
    assert(Robots.allowed(rules, "/pub/x"))
    assert(!Robots.allowed(rules, "/priv/x"))
    assert(Robots.allowed(rules, "/priv/ok/x")) // longer Allow beats Disallow
    // exact tie: Allow wins regardless of order
    val tie = Seq(Robots.Rule(allow = false, "/p"), Robots.Rule(allow = true, "/p"))
    assert(Robots.allowed(tie, "/p/x"))
    assert(Robots.allowed(tie.reverse, "/p/x"))
    assert(Robots.allowed(Nil, "/anything"))
  }

  test("decide(): host join, fail-open for missing robots, path extraction") {
    import spark.implicits._
    val pages = Seq(
      (1L, "https://a.example.com/priv/secret"),
      (2L, "https://a.example.com/priv/ok/fine"),
      (3L, "https://a.example.com/pub"),
      (4L, "https://b.example.com/priv/secret"), // no robots row: fail-open
      (5L, "https://a.example.com"), // no path → "/"
      (6L, "https://a.example.com/priv/x?q=1#frag") // query kept, fragment cut
    ).toDF("id", "url")
    val robots = Seq(
      ("a.example.com", "User-agent: *\nDisallow: /priv\nAllow: /priv/ok\nDisallow: /$")
    ).toDF("host", "txt")
    val out = Robots.decide(pages, "url", robots, "host", "txt", "graftbot")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> true, 4L -> true,
      5L -> false, 6L -> false)) // 5: "/$" anchors the bare root
    val kept = Robots.filterAllowed(pages, "url", robots, "host", "txt", "graftbot")
    assert(kept.select("id").as[Long].collect().toSet === Set(2L, 3L, 4L))
    assert(kept.columns.toSeq === pages.columns.toSeq, "payload contract intact")
  }

  test("pipeline --robots: disallowed pages dropped pre-dedup, resume key tracks the table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("robots").toString
    val pages = Seq(
      Page("https://crawl.me/ok/1", new java.sql.Timestamp(1000L), null,
        "alpha beta gamma delta epsilon zeta", "en"),
      Page("https://crawl.me/private/2", new java.sql.Timestamp(1000L), null,
        "some secret text nobody may fetch", "en"),
      Page("https://open.site/private/3", new java.sql.Timestamp(1000L), null,
        "no robots row here so fail open", "en")
    ).toDF()
    pages.write.mode("overwrite").parquet(s"$dir/in")
    Seq(("crawl.me", "User-agent: *\nDisallow: /private"))
      .toDF("host", "txt").write.mode("overwrite").parquet(s"$dir/robots")
    val args = Pipeline.parse(Array(
      "--input", s"$dir/in", "--output", s"$dir/out",
      "--robots", s"$dir/robots"))
    val (kept, _) = Pipeline.run(spark, args)
    assert(kept.select("url").as[String].collect().toSet ===
      Set("https://crawl.me/ok/1", "https://open.site/private/3"))
  }
}

package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** robots.txt semantics against the RFC 9309 / Google-spec examples:
  * group selection, wildcard + `$` matching, longest-match precedence,
  * and the broadcast gate. */
class RobotsSpec extends AnyFunSuite {

  test("group selection: exact token beats *, empty exact group still binds") {
    val txt =
      """# site robots
        |User-agent: graftbot
        |Disallow: /private
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(Robots.rulesFor(txt, "graftbot") == Seq((false, "/private")))
    assert(Robots.rulesFor(txt, "GRAFTBOT") == Seq((false, "/private")))
    assert(Robots.rulesFor(txt, "otherbot") == Seq((false, "/")))
    // RFC 9309: blank lines are insignificant — consecutive UA lines
    // merge into ONE group even across a blank, so graftbot here obeys
    // the shared Disallow, it does not get a private empty group
    val merged =
      "User-agent: graftbot\n\nUser-agent: *\nDisallow: /\n"
    assert(Robots.rulesFor(merged, "graftbot") == Seq((false, "/")))
    // a group naming the UA with NO rules (closed by EOF) means "this
    // bot: no limits" — it must NOT fall through to *
    val empty =
      "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\n"
    assert(Robots.rulesFor(empty, "graftbot").isEmpty)
    assert(Robots.evaluate(Robots.rulesFor(empty, "graftbot"), "/x")._1)
    // consecutive UA lines share one rule set; same-UA groups merge
    val multi =
      """User-agent: a
        |User-agent: b
        |Disallow: /one
        |User-agent: a
        |Disallow: /two
        |""".stripMargin
    assert(Robots.rulesFor(multi, "b") == Seq((false, "/one")))
    assert(Robots.rulesFor(multi, "a") ==
      Seq((false, "/one"), (false, "/two")))
    // rules before any group / empty Disallow values are ignored
    assert(Robots.rulesFor("Disallow: /loose\nUser-agent: *\nDisallow:\n",
      "x").isEmpty)
    assert(Robots.rulesFor(null, "x").isEmpty)
  }

  test("wildcard + $ matching: the spec example table") {
    val cases = Seq(
      ("/fish", "/fish", true), ("/fish", "/fishheads", true),
      ("/fish", "/fish/salmon.html", true), ("/fish", "/Fish.asp", false),
      ("/fish*", "/fish/salmon", true), ("/fish*", "/catfish", false),
      ("/fish/", "/fish/", true), ("/fish/", "/fish", false),
      ("/*.php", "/index.php", true), ("/*.php", "/folder/file.php", true),
      ("/*.php", "/windows.PHP", false),
      ("/*.php$", "/filename.php", true),
      ("/*.php$", "/filename.php?params", false),
      ("/*.php$", "/filename.php/", false),
      ("/fish*.php", "/fish.php", true),
      ("/fish*.php", "/fishheads/catfish.php", true),
      ("/fish*.php", "/fish.html", false),
      ("/p$", "/p", true), ("/p$", "/page", false),
      ("/a*b*c", "/aXbYc-and-more", true), ("/a*b*c", "/a-c-b", false),
      ("/end*$", "/endanything", true))
    cases.foreach { case (rule, path, want) =>
      assert(Robots.matches(path, rule) == want, s"'$rule' vs '$path'")
    }
  }

  test("longest-match precedence; Allow wins ties; no match = allowed") {
    val rules = Seq((true, "/p"), (false, "/"))
    assert(Robots.evaluate(rules, "/page") == ((true, "/p")))
    assert(Robots.evaluate(rules, "/") == ((false, "/")))
    // equal length: Allow wins regardless of order
    assert(Robots.evaluate(Seq((false, "/x"), (true, "/y")), "/xy")._1 == false)
    assert(Robots.evaluate(Seq((false, "/ab"), (true, "/ab")), "/abc") ==
      ((true, "/ab")))
    assert(Robots.evaluate(Seq((true, "/ab"), (false, "/ab")), "/abc") ==
      ((true, "/ab")))
    // a longer Disallow beats a shorter Allow
    assert(Robots.evaluate(Seq((true, "/f"), (false, "/folder")), "/folder/x") ==
      ((false, "/folder")))
    assert(Robots.evaluate(Seq.empty, "/anything") == ((true, null)))
  }

  test("gate: broadcast rules, default-allow for unlisted domains") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val urls = Seq(
      (1L, "a.com", "/private/x"), (2L, "a.com", "/public"),
      (3L, "b.com", "/anything"), (4L, "norobots.com", "/x"))
      .toDF("id", "domain", "path")
    val robots = Seq(
      ("a.com", "User-agent: graftbot\nDisallow: /private\nAllow: /private/x$\n"),
      ("b.com", "User-agent: *\nDisallow: /\n"))
      .toDF("domain", "robots_txt")
    val got = Robots.gate(urls, "domain", "path", robots, "domain",
        "robots_txt", "graftbot")
      .select($"id", $"allowed", $"rule")
      .as[(Long, Boolean, Option[String])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, true, Some("/private/x$")), // the $-anchored Allow is longer
      (2L, true, None),
      (3L, false, Some("/")),
      (4L, true, None)), s"$got")
  }

  test("crawl-delay: group selection, exact decimal ms, bounds loud-by-null") {
    val txt = "User-agent: graftbot\nCrawl-delay: 0.5\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 7\nAllow: /\n"
    assert(Robots.crawlDelayMs(txt, "graftbot") == 500)
    assert(Robots.crawlDelayMs(txt, "otherbot") == 7000)
    // first delay in a group wins; fractional seconds exact
    val multi = "User-agent: *\nCrawl-delay: 1.25\nCrawl-delay: 9\n"
    assert(Robots.crawlDelayMs(multi, "x") == 1250)
    // exact group with NO delay does not fall through to *
    val noDelay = "User-agent: graftbot\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 3\n"
    assert(Robots.crawlDelayMs(noDelay, "graftbot") == null)
    // malformed / out-of-range / sub-ms precision: null, never a guess
    assert(Robots.crawlDelayMs("User-agent: *\nCrawl-delay: soon\n", "x") == null)
    assert(Robots.crawlDelayMs("User-agent: *\nCrawl-delay: 4000\n", "x") == null)
    assert(Robots.crawlDelayMs("User-agent: *\nCrawl-delay: 0.0005\n", "x") == null)
    assert(Robots.crawlDelayMs("User-agent: *\nCrawl-delay: 3600\n", "x") == 3600000)
    assert(Robots.crawlDelayMs(null, "x") == null)
    assert(Robots.crawlDelayMs("no groups here", "x") == null)
  }

  test("sitemap directives collect globally across groups, document order") {
    val txt = "Sitemap: https://a/s1.xml\nUser-agent: *\nDisallow: /x\n" +
      "Sitemap: https://a/s2.xml\n# comment\nSitemap: https://a/s1.xml\n"
    assert(Robots.sitemapUrls(txt) == Seq("https://a/s1.xml",
      "https://a/s2.xml", "https://a/s1.xml")) // duplicates kept
    assert(Robots.sitemapUrls("nothing").isEmpty)
    assert(Robots.sitemapUrls(null).isEmpty)
    // the rule gate is unaffected by directive lines (parity guard)
    val rules = Robots.rulesFor(txt, "anybot")
    assert(rules == Seq((false, "/x")))
  }
}

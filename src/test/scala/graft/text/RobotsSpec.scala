package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rulesOf(body: String): Set[(String, Boolean)] =
    Robots.rules(Seq(("d", body)).toDF("domain", "body"), "domain", "body")
      .as[(String, String, Boolean)].collect()
      .map(r => (r._2, r._3)).toSet

  describe("Robots.rules") {
    it("collects only the User-agent: * group's rules") {
      rulesOf("User-agent: bot\nDisallow: /x\n" +
        "User-agent: *\nDisallow: /private\nDisallow: /tmp\n" +
        "User-agent: zeta\nDisallow: /p") shouldBe
        Set(("/private", false), ("/tmp", false))
    }

    it("collects Allow lines with allow=true") {
      rulesOf("User-agent: *\nDisallow: /\nAllow: /public") shouldBe
        Set(("/", false), ("/public", true))
    }

    it("ignores comments, blank lines, and unknown fields") {
      rulesOf("# top comment\nUser-agent: *\n\nCrawl-delay: 10\n" +
        "Disallow: /a\n# inline comment line\nDisallow: /b") shouldBe
        Set(("/a", false), ("/b", false))
    }

    it("empty Disallow/Allow carry no rule") {
      rulesOf("User-agent: *\nDisallow:\nAllow:") shouldBe Set.empty
    }

    it("no * group → no rules") {
      rulesOf("User-agent: other\nDisallow: /") shouldBe Set.empty
    }

    it("field names match case-insensitively, values trim") {
      rulesOf("USER-AGENT: *\nDISALLOW:   /Secret  \nALLOW: /Secret/ok") shouldBe
        Set(("/Secret", false), ("/Secret/ok", true))
    }

    it("a later * group adds its rules too") {
      rulesOf("User-agent: *\nDisallow: /a\nUser-agent: b\nDisallow: /x\n" +
        "User-agent: *\nDisallow: /c") shouldBe
        Set(("/a", false), ("/c", false))
    }

    it("consecutive UA lines share the rule group (RFC grammar)") {
      // '*' first, specific agent second — the rules bind to both
      rulesOf("User-agent: *\nUser-agent: b\nDisallow: /x") shouldBe
        Set(("/x", false))
      // specific agent first, '*' second — same sharing
      rulesOf("User-agent: b\nUser-agent: *\nDisallow: /y") shouldBe
        Set(("/y", false))
    }

    it("comments and blanks inside a UA run are insignificant") {
      rulesOf("User-agent: b\n# c\n\nUser-agent: *\nDisallow: /z") shouldBe
        Set(("/z", false))
    }

    it("a rule line ends the UA run — a later UA starts a new group") {
      // the Crawl-delay (unknown rule) ends *'s run, so the 'b'
      // group that follows does NOT share with '*'
      rulesOf("User-agent: *\nCrawl-delay: 10\n" +
        "User-agent: b\nDisallow: /w") shouldBe Set.empty
    }
  }

  private def rulesAs(agent: String, body: String): Set[(String, Boolean)] =
    Robots.rules(Seq(("d", body)).toDF("domain", "body"),
        "domain", "body", agent = Some(agent))
      .as[(String, String, Boolean)].collect()
      .map(r => (r._2, r._3)).toSet

  describe("Robots.rules with a configured crawler name " +
      "(RFC 9309 most-specific election)") {
    val body = "User-agent: graftbot\nDisallow: /bot-only\n" +
      "User-agent: *\nDisallow: /everyone\nAllow: /open"

    it("a group naming the crawler overrides the * group entirely") {
      rulesAs("graftbot", body) shouldBe Set(("/bot-only", false))
    }

    it("an unnamed crawler falls back to the * group") {
      rulesAs("otherbot", body) shouldBe
        Set(("/everyone", false), ("/open", true))
      // and the no-agent default is the same fallback
      rulesOf(body) shouldBe Set(("/everyone", false), ("/open", true))
    }

    it("the product-token match is case-insensitive") {
      rulesAs("GraftBot", "User-agent: GRAFTBOT\nDisallow: /g\n" +
        "User-agent: *\nDisallow: /s") shouldBe Set(("/g", false))
    }

    it("multiple groups naming the crawler combine (RFC: matching " +
        "groups' rules MUST be combined)") {
      rulesAs("graftbot",
        "User-agent: graftbot\nDisallow: /a\n" +
          "User-agent: *\nDisallow: /star\n" +
          "User-agent: graftbot\nAllow: /a/ok") shouldBe
        Set(("/a", false), ("/a/ok", true))
    }

    it("a shared UA run binds its rules to both the name and *") {
      // consecutive UA lines: the group serves graftbot AND '*';
      // graftbot elects it as a NAMED group (not via the * path)
      rulesAs("graftbot",
        "User-agent: graftbot\nUser-agent: *\nDisallow: /both") shouldBe
        Set(("/both", false))
    }

    it("the election is per domain: a named group on one domain " +
        "does not suppress * groups on another") {
      val robots = Seq(
        ("a.com", "User-agent: graftbot\nDisallow: /g\n" +
          "User-agent: *\nDisallow: /s"),
        ("b.com", "User-agent: *\nDisallow: /t")).toDF("domain", "body")
      Robots.rules(robots, "domain", "body", agent = Some("graftbot"))
        .as[(String, String, Boolean)].collect().toSet shouldBe
        Set(("a.com", "/g", false), ("b.com", "/t", false))
    }
  }

  private def allowed(urls: Seq[(Long, String)],
      rules: Seq[(String, String, Boolean)]): Seq[Long] =
    Robots.filterAllowed(urls.toDF("id", "url"), "url",
        rules.toDF("domain", "rule", "allow"))
      .as[(Long, String)].collect().map(_._1).sorted.toSeq

  describe("Robots.filterAllowed (RFC 9309 longest-match)") {
    it("drops URLs whose path has a disallowed prefix, per domain") {
      allowed(Seq(
        (1L, "https://a.com/private/x"), // blocked on a.com
        (2L, "https://a.com/public/x"), // allowed
        (3L, "https://b.com/private/x"), // b.com has no rules → allowed
        (4L, "https://a.com/privateer"), // literal prefix → blocked
        (5L, "https://a.com/")), // allowed
        Seq(("a.com", "/private", false))) shouldBe Seq(2L, 3L, 5L)
    }

    it("a bare '/' rule blocks the whole domain") {
      allowed(Seq((1L, "https://a.com/x"), (2L, "https://a.com"),
        (3L, "https://b.com/x")),
        Seq(("a.com", "/", false))) shouldBe Seq(3L)
    }

    it("Allow overrides a shorter Disallow (Disallow:/ + Allow:/public)") {
      allowed(Seq(
        (1L, "https://a.com/public/page"), // Allow /public (7) beats / (1)
        (2L, "https://a.com/private/page"), // only / matches → blocked
        (3L, "https://a.com/")), // only / matches → blocked
        Seq(("a.com", "/", false), ("a.com", "/public", true))) shouldBe
        Seq(1L)
    }

    it("a longer Disallow re-blocks inside an Allow subtree") {
      allowed(Seq(
        (1L, "https://a.com/public/ok"),
        (2L, "https://a.com/public/secret/x")),
        Seq(("a.com", "/", false), ("a.com", "/public", true),
          ("a.com", "/public/secret", false))) shouldBe Seq(1L)
    }

    it("equal-length rules tie-break toward Allow") {
      allowed(Seq((1L, "https://a.com/page")),
        Seq(("a.com", "/page", false), ("a.com", "/page", true))) shouldBe
        Seq(1L)
    }

    it("* wildcards match any character run") {
      allowed(Seq(
        (1L, "https://a.com/fish.php"),
        (2L, "https://a.com/fishheads/catfish.php?x=1"),
        (3L, "https://a.com/fish/ok.html")),
        // blocks any path containing 'fish' then '.php'
        Seq(("a.com", "/fish*.php", false))) shouldBe Seq(3L)
    }

    it("a trailing $ anchors at the path end") {
      allowed(Seq(
        (1L, "https://a.com/doc.pdf"), // ends .pdf → blocked
        (2L, "https://a.com/doc.pdfx")), // does not END there → allowed
        Seq(("a.com", "/*.pdf$", false))) shouldBe Seq(2L)
    }

    it("regex metacharacters in patterns stay literal") {
      allowed(Seq(
        (1L, "https://a.com/a.b/x"), // literal dot path → blocked
        (2L, "https://a.com/aXb/x")), // '.' must not match X
        Seq(("a.com", "/a.b", false))) shouldBe Seq(2L)
    }

    it("keeps the original columns and no helpers") {
      val urls = Seq((1L, "https://a.com/x", "extra")).toDF("id", "url", "meta")
      val got = Robots.filterAllowed(urls, "url",
        Seq.empty[(String, String, Boolean)].toDF("domain", "rule", "allow"))
      got.columns.toSeq shouldBe Seq("id", "url", "meta")
      got.count() shouldBe 1L
    }
  }
}

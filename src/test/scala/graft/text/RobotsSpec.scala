package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rulesOf(body: String): Set[String] =
    Robots.rules(Seq(("d", body)).toDF("domain", "body"), "domain", "body")
      .as[(String, String)].collect().map(_._2).toSet

  describe("Robots.rules") {
    it("collects only the User-agent: * group's Disallow lines") {
      rulesOf("User-agent: bot\nDisallow: /x\n" +
        "User-agent: *\nDisallow: /private\nDisallow: /tmp\n" +
        "User-agent: zeta\nDisallow: /p") shouldBe Set("/private", "/tmp")
    }

    it("ignores comments, blank lines, and unknown fields") {
      rulesOf("# top comment\nUser-agent: *\n\nCrawl-delay: 10\n" +
        "Disallow: /a\n# inline comment line\nDisallow: /b") shouldBe
        Set("/a", "/b")
    }

    it("empty Disallow means nothing is disallowed") {
      rulesOf("User-agent: *\nDisallow:") shouldBe Set.empty
    }

    it("no * group → no rules") {
      rulesOf("User-agent: other\nDisallow: /") shouldBe Set.empty
    }

    it("field names match case-insensitively, values trim") {
      rulesOf("USER-AGENT: *\nDISALLOW:   /Secret  ") shouldBe Set("/Secret")
    }

    it("a later * group adds its rules too") {
      rulesOf("User-agent: *\nDisallow: /a\nUser-agent: b\nDisallow: /x\n" +
        "User-agent: *\nDisallow: /c") shouldBe Set("/a", "/c")
    }
  }

  describe("Robots.filterAllowed") {
    it("drops URLs whose path has a disallowed prefix, per domain") {
      val urls = Seq(
        (1L, "https://a.com/private/x"), // blocked on a.com
        (2L, "https://a.com/public/x"), // allowed
        (3L, "https://b.com/private/x"), // b.com has no rules → allowed
        (4L, "https://a.com/privateer"), // literal prefix → blocked
        (5L, "https://a.com/")).toDF("id", "url") // allowed
      val rules = Seq(("a.com", "/private")).toDF("domain", "rule")
      val got = Robots.filterAllowed(urls, "url", rules)
        .as[(Long, String)].collect().map(_._1).sorted.toSeq
      got shouldBe Seq(2L, 3L, 5L)
    }

    it("a bare '/' rule blocks the whole domain") {
      val urls = Seq((1L, "https://a.com/x"), (2L, "https://a.com"),
        (3L, "https://b.com/x")).toDF("id", "url")
      val rules = Seq(("a.com", "/")).toDF("domain", "rule")
      Robots.filterAllowed(urls, "url", rules)
        .as[(Long, String)].collect().map(_._1).toSeq shouldBe Seq(3L)
    }

    it("keeps the original columns and no helpers") {
      val urls = Seq((1L, "https://a.com/x", "extra")).toDF("id", "url", "meta")
      val got = Robots.filterAllowed(urls, "url",
        Seq.empty[(String, String)].toDF("domain", "rule"))
      got.columns.toSeq shouldBe Seq("id", "url", "meta")
      got.count() shouldBe 1L
    }
  }
}

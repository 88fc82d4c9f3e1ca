package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class UrlsSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize(col("u"))).as[String]
      .collect().toSeq

  describe("Urls.canonicalize") {
    it("collapses case/port/tracking variants to one form") {
      canon(
        "HTTPS://WWW.Site.COM:443/a/B?utm_source=x&id=7&ref=tw#top",
        "https://site.com/a/B?id=7",
        "https://www.site.com:443/a/B?utm_medium=y&id=7") shouldBe
        Seq.fill(3)("https://site.com/a/B?id=7")
    }

    it("keeps non-default ports and non-tracking params in order") {
      canon("http://h.com:8080/p?b=2&a=1") shouldBe
        Seq("http://h.com:8080/p?b=2&a=1")
    }

    it("drops default http port, empty path becomes /") {
      canon("http://H.com:80?utm_x=1", "http://h.com/") shouldBe
        Seq("http://h.com/", "http://h.com/")
    }

    it("path case is preserved (paths are case-sensitive)") {
      canon("https://x.com/CaseSensitive") shouldBe
        Seq("https://x.com/CaseSensitive")
    }
  }

  describe("SegmentDedup.dedupSegmentsWithinDoc") {
    import graft.dedup.SegmentDedup
    it("drops repeats within a doc, keeps cross-doc repeats") {
      val docs = Seq(
        (1L, "a b a b c d"), // segs(2): "a b","a b","c d" -> kept "a b","c d"
        (2L, "a b x y")) // "a b" survives here (scope is per-doc)
        .toDF("doc_id", "text")
      val out = SegmentDedup.dedupSegmentsWithinDoc(docs, "doc_id", "text", 2)
        .orderBy("doc_id").collect()
      out(0).getLong(1) shouldBe 3L
      out(0).getLong(2) shouldBe 2L
      out(0).getString(3) shouldBe "a b c d"
      out(1).getLong(2) shouldBe 2L
      out(1).getString(3) shouldBe "a b x y"
    }

    it("plans no shuffle (pure per-row expression)") {
      val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
      val plan = SegmentDedup.dedupSegmentsWithinDoc(docs, "doc_id", "text", 2)
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
    }
  }

  describe("Urls.domainSuffixes / blockedBy") {
    it("generates dot-boundary suffixes, most-specific first") {
      Seq("a.b.example.com").toDF("d")
        .select(Urls.domainSuffixes(col("d"))).as[Seq[String]].head() shouldBe
        Seq("a.b.example.com", "b.example.com", "example.com", "com")
    }

    it("blocks listed domains and subdomains at dot boundaries only") {
      val bl = Seq("ads.example.com", "spam.example.net")
      val cases = Seq(
        "ads.example.com" -> true,          // exact entry
        "tracker.ads.example.com" -> true,  // subdomain of entry
        "notads.example.com" -> false,      // dot-boundary trap
        "spam.example.net" -> true,
        "example.com" -> false,             // parent of entry is NOT blocked
        "ads.example.com.evil.org" -> false) // entry as a PREFIX, not suffix
      cases.foreach { case (d, want) =>
        withClue(d) {
          Seq(d).toDF("d").select(Urls.blockedBy(col("d"), bl))
            .as[Boolean].head() shouldBe want
        }
      }
    }

    it("rejects an empty blocklist") {
      an[IllegalArgumentException] should be thrownBy
        Urls.blockedBy(col("d"), Seq.empty)
    }
  }

  describe("Urls.filterBlocked (large-list join path)") {
    it("matches blockedBy semantics and plans no nested-loop join") {
      val bl = Seq("ads.example.com", "spam.example.net").toDF("dom")
      val docs = Seq(
        (1L, "ads.example.com"),
        (2L, "tracker.ads.example.com"),
        (3L, "notads.example.com"),
        (4L, "news.example.org"),
        (5L, "ads.example.com.evil.org")).toDF("id", "domain")
      val out = Urls.filterBlocked(docs, "domain", bl)
      out.select("id").as[Long].collect().sorted shouldBe Array(3L, 4L, 5L)
      val plan = out.queryExecution.executedPlan.toString
      plan should not include "BroadcastNestedLoopJoin"
      plan should not include "CartesianProduct"
    }
  
    it("drops null domains (predicate-path parity) and rejects multi-column blocklists") {
      val bl = Seq("ads.example.com").toDF("dom")
      val docs = Seq((1L, Some("ads.example.com")), (2L, Some("ok.example.org")),
        (3L, None: Option[String])).toDF("id", "domain")
      Urls.filterBlocked(docs, "domain", bl)
        .select("id").as[Long].collect().sorted shouldBe Array(2L)
      an[IllegalArgumentException] should be thrownBy
        Urls.filterBlocked(docs, "domain", Seq(("x", "y")).toDF("a", "b"))
    }
  }
}

package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class HtmlExtractSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private def extract(html: String*): Seq[String] =
    html.toDF("h").select(HtmlExtract.mainText(col("h"))).as[String]
      .collect().toSeq

  describe("HtmlExtract.mainText") {
    it("drops machinery and chrome blocks wholesale, keeps content") {
      extract(
        "<html><head><style>p{a:1}</style>" +
          "<script>if (1 < 2) { go(); }</script></head>" +
          "<body><nav>Home | About</nav><p>kept text</p>" +
          "<footer>legal</footer></body></html>") shouldBe Seq("kept text")
    }

    it("is case-insensitive on tag names and spans lines") {
      extract(
        "<SCRIPT src=\"a.js\">var\nx = 1;</SCRIPT><P>body\nline</P>" +
          "<ASIDE>ad\nunit</ASIDE>") shouldBe Seq("body line")
    }

    it("strips markup of an UNCLOSED chrome tag but keeps its text") {
      // heuristic extractor, not a DOM parser: no closing </aside>
      // means no block match — the tag is stripped, the text stays
      extract("<p>alpha</p><aside>beta gamma") shouldBe Seq("alpha beta gamma")
    }

    it("lazy block match: sibling blocks do not fuse") {
      extract("<nav>n1</nav>keep<nav>n2</nav>") shouldBe Seq("keep")
    }

    it("drops comments, including multi-line ones") {
      extract("a<!-- one -->b<!-- two\nlines -->c") shouldBe Seq("a b c")
    }

    it("decodes listed entities; &amp; LAST so &amp;lt; never double-decodes") {
      extract("x &amp;lt; y &lt;em&gt; &nbsp;&quot;q&quot; &#39;t&#39; &amp; z") shouldBe
        Seq("x &lt; y <em> \"q\" 't' & z")
    }

    it("passes non-listed entities through untouched") {
      extract("&copy; 2026 &hellip;") shouldBe Seq("&copy; 2026 &hellip;")
    }

    it("collapses all whitespace runs and trims the ends") {
      extract("  a \n\t b   c  ") shouldBe Seq("a b c")
    }

    it("whole extraction is a single zero-exchange projection") {
      val plan = spark.range(10).toDF("id")
        .select(HtmlExtract.mainText(concat(lit("<p>"), col("id"), lit("</p>"))))
        .queryExecution.executedPlan.toString
      "Exchange".r.findAllIn(plan).size shouldBe 0
    }

    it("mainTextSql mirrors the chain: same fixture, same result via SQL") {
      // the oracle generator must stay in lockstep with the Column
      // chain — run both over the q116 fixture shape and compare
      val df = Seq((7L, "plain words here")).toDF("doc_id", "text")
      val sparkSide = df.select(graft.TrainEntry.syntheticHtml(
          col("doc_id"), col("text")).as("html"))
        .select(HtmlExtract.mainText(col("html"))).as[String].head()
      sparkSide should include("Doc 7")
      sparkSide should include("plain words here")
      sparkSide should include("&lt;")       // &amp;lt; single-decode
      sparkSide should include("<em>")       // &lt;em&gt; decodes to markup-as-text
      sparkSide should include("&copy; kept") // non-listed entity survives
      (sparkSide should not).include("sponsored") // closed aside dropped
      sparkSide should include("tail promo")      // unclosed aside text kept
      (sparkSide should not).include("Home")      // nav chrome dropped
      (sparkSide should not).include("render()")  // script dropped
    }
  }

  describe("HtmlExtract.links") {
    def linksOf(html: String): Seq[String] =
      Seq(html).toDF("h").select(HtmlExtract.links(col("h")))
        .as[Seq[String]].head()

    it("extracts hrefs in document order, attributes before and after") {
      linksOf("<a href=\"/one\">1</a><p>x</p>" +
        "<a class=\"c\" rel=\"nofollow\" href=\"https://b.com/two\">2</a>" +
        "<A HREF=\"/three\" target=\"_blank\">3</A>") shouldBe
        Seq("/one", "https://b.com/two", "/three")
    }

    it("extracts from nav/footer too (graph signal, not text)") {
      linksOf("<nav><a href=\"/home\">Home</a></nav>" +
        "<footer><a href=\"/legal\">Legal</a></footer>") shouldBe
        Seq("/home", "/legal")
    }

    it("lazy attr scan never crosses a tag boundary") {
      // no href in the <a>: must NOT steal the next tag's href
      linksOf("<a name=\"x\">no link</a><link href=\"/css\">") shouldBe empty
    }

    it("single-quoted hrefs are outside the contract (not matched)") {
      linksOf("<a href='/sq'>x</a>") shouldBe empty
    }

    it("empty page yields an empty list, not null") {
      linksOf("<p>no anchors</p>") shouldBe empty
    }
  }

  describe("HtmlExtract.anchors") {
    def pairsOf(html: String): Seq[(String, String)] =
      Seq(html).toDF("h")
        .select(HtmlExtract.anchorHrefs(col("h")),
          HtmlExtract.anchorTexts(col("h")))
        .as[(Seq[String], Seq[String])].head() match {
        case (hs, ts) => hs.zip(ts)
      }

    it("hrefs and texts stay position-aligned") {
      pairsOf("<a href=\"/a\">One</a> gap " +
        "<a rel=\"x\" href=\"/b\" id=\"k\">Two words</a>") shouldBe
        Seq("/a" -> "One", "/b" -> "Two words")
    }

    it("anchors with nested markup inside are outside the contract") {
      pairsOf("<a href=\"/a\"><b>bold</b></a><a href=\"/c\">ok</a>") shouldBe
        Seq("/c" -> "ok")
    }

    it("empty anchor text is kept (pairs stay aligned)") {
      pairsOf("<a href=\"/a\"></a><a href=\"/b\">t</a>") shouldBe
        Seq("/a" -> "", "/b" -> "t")
    }
  }
}

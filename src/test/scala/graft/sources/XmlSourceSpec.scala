package graft.sources

import graft.SparkSpec

class XmlSourceSpec extends SparkSpec {
  import spark.implicits._

  private def shred(xml: (Long, String)*) =
    XmlSource.shred(xml.toSeq.toDF("doc_id", "xml"), "doc_id", "xml",
      "item", Seq("name", "qty"))

  describe("XmlSource.shred") {
    it("parses records in document order with real entity decoding") {
      val out = shred((1L,
        "<doc><item><name>a &amp; b</name><qty>3</qty></item>" +
          "<item><name><![CDATA[x<y]]></name><qty> 7 </qty></item></doc>"))
        .orderBy("rec_idx").collect()
      out.length shouldBe 2
      out(0).getString(3) shouldBe "a & b" // entity decoded
      out(0).getString(4) shouldBe "3"
      out(1).getString(3) shouldBe "x<y" // CDATA verbatim
      out(1).getString(4) shouldBe "7" // trimmed
      out.map(_.getBoolean(2)).toSeq shouldBe Seq(false, false)
    }
    it("missing fields project null; unknown tags are ignored") {
      val out = shred((1L,
        "<doc><item><name>n</name><extra>z</extra></item></doc>"))
        .collect()
      out.head.getString(3) shouldBe "n"
      out.head.isNullAt(4) shouldBe true
    }
    it("malformed documents yield one audited row, not silence") {
      val out = shred(
        (1L, "<doc><item><name>ok</name><qty>1</qty></item></doc>"),
        (2L, "<doc><item><name>broken"))
        .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
      out shouldBe Set((1L, false), (2L, true))
    }
    it("rejects DTDs (XXE hardening): a doctype counts as malformed") {
      val out = shred((1L,
        "<!DOCTYPE doc [<!ENTITY x SYSTEM \"file:///etc/hostname\">]>" +
          "<doc><item><name>&x;</name></item></doc>"))
        .collect()
      out.length shouldBe 1
      out.head.getBoolean(2) shouldBe true
    }
    it("finds record tags at any nesting depth") {
      val out = shred((1L,
        "<doc><group><item><name>deep</name><qty>9</qty></item>" +
          "</group></doc>")).collect()
      out.head.getString(3) shouldBe "deep"
    }
  }
}

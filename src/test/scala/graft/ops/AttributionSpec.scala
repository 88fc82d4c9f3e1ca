package graft.ops

import graft.SparkSpec

/** First/last-touch attribution semantics (q148). */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, user_id, ms, channel, is_conversion, value)
  private def ev(rows: (Long, Long, Long, String, Boolean, Double)*) =
    rows.toDF("event_id", "user_id", "ms", "channel", "is_conversion", "value")

  private def run(rows: (Long, Long, Long, String, Boolean, Double)*) =
    Attribution.credit(ev(rows: _*))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  it("credits the first and last touch strictly before the conversion") {
    val out = run(
      (1L, 1L, 10L, "ad", false, 0.0),
      (2L, 1L, 20L, "email", false, 0.0),
      (3L, 1L, 30L, null, true, 5.0), // conv: first=ad, last=email
      (4L, 1L, 40L, "social", false, 0.0), // after the conv: no credit
      (5L, 1L, 50L, null, true, 7.0)) // first=ad, last=social
    out(("first_touch", "ad")) shouldBe ((2L, 12.0))
    out(("last_touch", "email")) shouldBe ((1L, 5.0))
    out(("last_touch", "social")) shouldBe ((1L, 7.0))
    out.keySet.count(_._1 == "last_touch") shouldBe 2
  }

  it("a conversion with no prior touch lands in '(none)'") {
    val out = run(
      (1L, 9L, 10L, null, true, 3.0),
      (2L, 9L, 20L, "ad", false, 0.0),
      (3L, 9L, 30L, null, true, 4.0))
    out(("first_touch", "(none)")) shouldBe ((1L, 3.0))
    out(("first_touch", "ad")) shouldBe ((1L, 4.0))
    out(("last_touch", "(none)")) shouldBe ((1L, 3.0))
  }

  it("ms ties break on event_id (touch counts iff its id is smaller)") {
    val out = run(
      (1L, 5L, 10L, "ad", false, 0.0),
      (2L, 5L, 10L, null, true, 1.0), // tied ms, touch id 1 < conv id 2 → credited
      (4L, 5L, 20L, null, true, 1.0),
      (5L, 5L, 20L, "email", false, 0.0)) // tied ms, id AFTER conv → not credited
    out(("last_touch", "ad")) shouldBe ((2L, 2.0))
    out.keySet should not contain (("last_touch", "email"))
  }

  it("users never cross-credit each other") {
    val out = run(
      (1L, 1L, 10L, "ad", false, 0.0),
      (2L, 2L, 20L, null, true, 1.0))
    out(("first_touch", "(none)")) shouldBe ((1L, 1.0))
  }

  private def runPos(rows: (Long, Long, Long, String, Boolean, Double)*) =
    Attribution.positionCredit(ev(rows: _*))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .toMap

  it("position credit: single touch takes all 10000 bp") {
    val out = runPos(
      (1L, 1L, 10L, "ad", false, 0.0),
      (2L, 1L, 20L, null, true, 5.0))
    out("ad") shouldBe ((1L, 10000L, 5.0))
  }

  it("position credit: two touches split 50/50, five follow 40/20/40 with exact remainders") {
    val out = runPos(
      (1L, 1L, 10L, "a", false, 0.0),
      (2L, 1L, 20L, "b", false, 0.0),
      (3L, 1L, 30L, null, true, 10.0),
      // user 2: five touches c,d,e,f,g then conversion worth 100
      (11L, 2L, 10L, "c", false, 0.0),
      (12L, 2L, 20L, "d", false, 0.0),
      (13L, 2L, 30L, "e", false, 0.0),
      (14L, 2L, 40L, "f", false, 0.0),
      (15L, 2L, 50L, "g", false, 0.0),
      (16L, 2L, 60L, null, true, 100.0))
    out("a") shouldBe ((1L, 5000L, 5.0))
    out("b") shouldBe ((1L, 5000L, 5.0))
    // first: 4000 + 2000 % 3 = 4002; middles: 2000 div 3 = 666
    out("c") shouldBe ((1L, 4002L, 40.02))
    out("d") shouldBe ((1L, 666L, 6.66))
    out("e") shouldBe ((1L, 666L, 6.66))
    out("f") shouldBe ((1L, 666L, 6.66))
    out("g") shouldBe ((1L, 4000L, 40.0))
    // bp conservation
    Seq("c", "d", "e", "f", "g").map(out(_)._2).sum shouldBe 10000L
  }

  it("position credit: untouched conversions land whole in '(none)'") {
    val out = runPos(
      (1L, 5L, 10L, null, true, 3.0),
      (2L, 6L, 10L, "ad", false, 0.0),
      (3L, 6L, 20L, null, true, 7.0))
    out("(none)") shouldBe ((1L, 10000L, 3.0))
    out("ad") shouldBe ((1L, 10000L, 7.0))
  }
}

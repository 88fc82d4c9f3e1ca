package graft.ops

import graft.SparkSpec

/** TwoHop.reach and Twap.daily contracts. */
class TwoHopTwapSpec extends SparkSpec {
  import spark.implicits._

  private def reach(edges: (String, String)*) =
    TwoHop.reach(edges.toSeq.toDF("s", "d"), "s", "d")
      .as[(String, Long)].collect().sortBy(_._1).toSeq

  describe("TwoHop.reach") {
    it("counts strict two-hop neighbors on a directed cycle") {
      reach(("a", "b"), ("b", "c"), ("c", "a")) shouldBe Seq(
        ("a", 1L), ("b", 1L), ("c", 1L)) // a→b→c, b→c→a, c→a→b
    }
    it("excludes direct neighbors and self; duplicate edges collapse") {
      // a→c direct now, so a's only 2-hop candidate c is excluded and
      // a→b→c / a→c→a leave nothing; b and c keep their reach
      reach(("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
        .filter(_._1 == "a") shouldBe empty
    }
    it("drops self-loops before pairing") {
      reach(("a", "a"), ("a", "b")) shouldBe empty
    }
  }

  private def twap(rows: (String, Long, Long, Double)*) =
    Twap.daily(rows.toSeq.toDF("series", "ms", "id", "value"))
      .select("series", "day", "n_samples", "covered_ms", "twap")
      .as[(String, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

  describe("Twap.daily") {
    it("weights each value by its holding time") {
      // 10.0 for the first half-day, 20.0 for the second → 15.0
      twap(("m", 0L, 1L, 10.0), ("m", 43200000L, 2L, 20.0)) shouldBe
        Seq(("m", 0L, 2L, 86400000L, 15.0))
    }
    it("holds the last sample to midnight; coverage starts at first") {
      twap(("m", 86400000L + 21600000L, 1L, 8.0)) shouldBe
        Seq(("m", 1L, 1L, 64800000L, 8.0))
    }
    it("a same-ms tie gives the earlier id zero weight") {
      twap(("m", 0L, 1L, 999.0), ("m", 0L, 2L, 4.0)) shouldBe
        Seq(("m", 0L, 2L, 86400000L, 4.0))
    }
    it("days and series aggregate independently") {
      val r = twap(("m", 0L, 1L, 1.0), ("m", 86400000L, 2L, 2.0),
        ("x", 0L, 3L, 5.0))
      r.map(t => (t._1, t._2, t._5)) shouldBe Seq(
        ("m", 0L, 1.0), ("m", 1L, 2.0), ("x", 0L, 5.0))
    }
  }
}

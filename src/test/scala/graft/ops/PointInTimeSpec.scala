package graft.ops

import graft.SparkSpec

class PointInTimeSpec extends SparkSpec {
  import spark.implicits._

  describe("PointInTime.historyFromChanges") {
    it("chains valid_from/valid_to per key, open-ended last version") {
      val changes = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "x"))
        .toDF("k", "ts", "v")
      val out = PointInTime.historyFromChanges(changes, Seq("k"), "ts")
        .select("k", "valid_from", "valid_to", "v")
        .as[(Long, Long, Option[Long], String)].collect().sorted
      out shouldBe Array(
        (1L, 10L, Some(20L), "a"),
        (1L, 20L, None, "b"),
        (2L, 15L, None, "x"))
    }
  }

  describe("PointInTime.join") {
    val history = Seq(
      (1L, 10L, Some(20L), "v1"),
      (1L, 20L, Some(30L), "v2"),
      // gap [30, 40)
      (1L, 40L, None, "v3"))
      .toDF("k", "valid_from", "valid_to", "ver")

    it("matches each fact to the version valid at its ts") {
      val facts = Seq((1L, 10L), (1L, 19L), (1L, 25L), (1L, 100L))
        .toDF("k", "ts")
      val out = PointInTime.join(facts, history, Seq("k"), "ts", Seq("ver"))
        .orderBy("ts").select("ts", "ver")
        .as[(Long, Option[String])].collect()
      out shouldBe Array(
        (10L, Some("v1")), // inclusive valid_from
        (19L, Some("v1")),
        (25L, Some("v2")),
        (100L, Some("v3")))
    }
    it("two changes at one timestamp resolve deterministically to the later version") {
      // historyFromChanges gives the first change a zero-width
      // [10, 10) interval; interval semantics say only the second
      // version is ever visible
      val changes = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"))
        .toDF("k", "ts", "change_id", "v")
      val hist = PointInTime.historyFromChanges(changes, Seq("k"), "ts",
        tiebreak = Seq("change_id"))
      val facts = Seq((1L, 10L), (1L, 15L)).toDF("k", "ts")
      val out = PointInTime.join(facts, hist, Seq("k"), "ts", Seq("v"))
        .orderBy("ts").select("ts", "v")
        .as[(Long, Option[String])].collect()
      out shouldBe Array((10L, Some("b")), (15L, Some("b")))
    }
    it("facts before the first version or inside a gap get NULL payload") {
      val facts = Seq((1L, 5L), (1L, 35L), (2L, 50L)).toDF("k", "ts")
      val out = PointInTime.join(facts, history, Seq("k"), "ts", Seq("ver"))
        .orderBy("k", "ts").select("k", "ts", "ver")
        .as[(Long, Long, Option[String])].collect()
      out shouldBe Array(
        (1L, 5L, None),   // before first version
        (1L, 35L, None),  // in the [30, 40) hole
        (2L, 50L, None))  // key never versioned
    }
  }
}

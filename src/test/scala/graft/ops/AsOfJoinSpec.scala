package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  describe("AsOfJoin") {
    import spark.implicits._
    lazy val left = Seq(
      (1L, 10L, "c1"), (1L, 20L, "c2"), (1L, 5L, "c0"),
      (2L, 10L, "c3")) // user 2 has no purchases
      .toDF("k", "ts", "tag")
    lazy val right = Seq(
      (1L, 8L, 100.0), (1L, 20L, 200.0), (3L, 1L, 999.0))
      .toDF("k", "ts", "v")
      .select($"k", $"ts", $"ts".as("r_ts"), $"v".as("r_v"))

    it("matches the latest right row at-or-before each left ts, null when none") {
      val out = AsOfJoin(left, right, Seq("k"), "ts", "ts", Seq("r_ts", "r_v"))
        .select("k", "ts", "tag", "r_ts", "r_v")
        .as[(Long, Long, String, Option[Long], Option[Double])]
        .collect().sortBy(r => (r._1, r._2))
      out shouldBe Array(
        (1L, 5L, "c0", None, None),              // before any purchase
        (1L, 10L, "c1", Some(8L), Some(100.0)),  // latest <= 10 is ts 8
        (1L, 20L, "c2", Some(20L), Some(200.0)), // tie: ts 20 matches
        (2L, 10L, "c3", None, None))             // no right rows for key
    }

    it("carries all right fields from the same matched row") {
      val r2 = Seq((1L, 8L, Option.empty[Double], "row8"),
        (1L, 9L, Some(5.0), "row9"))
        .toDF("k", "ts", "maybe", "label")
        .select($"k", $"ts", $"maybe".as("r_m"), $"label".as("r_l"))
      val out = AsOfJoin(left.filter($"ts" === 10L && $"k" === 1L), r2,
        Seq("k"), "ts", "ts", Seq("r_m", "r_l"))
        .select("r_m", "r_l").as[(Option[Double], String)].head()
      // latest row (ts 9) wins wholesale — r_m is Some(5), not row8's null
      out shouldBe ((Some(5.0), "row9"))
    }
  }
}

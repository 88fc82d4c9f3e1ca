package graft.ops

import graft.SparkSpec

/** JoinProfile.profile contract: exact many-to-many cardinality,
  * containment and match-share arithmetic, null-key exclusion.
  */
class JoinProfileSpec extends SparkSpec {
  import spark.implicits._

  describe("JoinProfile.profile") {
    it("sizes a many-to-many join exactly and scores containment") {
      // left keys: 1×2 rows, 2×1, 3×1 (unmatched)
      // right keys: 1×3 rows, 2×2, 9×1 (unmatched)
      val l = Seq(1L, 1L, 2L, 3L).toDF("k")
      val r = Seq(1L, 1L, 1L, 2L, 2L, 9L).toDF("j")
      val p = JoinProfile.profile(l, "k", r, "j")
        .select("l_rows", "l_distinct", "r_rows", "r_distinct",
          "matched_keys", "join_rows", "l_key_containment",
          "r_key_containment", "l_row_match_share", "r_row_match_share")
        .as[(Long, Long, Long, Long, Long, Long, Double, Double,
          Double, Double)].head()
      p shouldBe ((4L, 3L, 6L, 3L, 2L,
        2L * 3 + 1 * 2, // = 8 joined rows
        round9(2.0 / 3), round9(2.0 / 3),
        0.75, // 3 of 4 left rows match
        round9(5.0 / 6))) // 5 of 6 right rows match
    }
    it("excludes null keys from matching but reports them") {
      val l = Seq(Some(1L), None, None).toDF("k")
      val r = Seq(Some(1L), Some(1L), None).toDF("j")
      val p = JoinProfile.profile(l, "k", r, "j")
        .select("l_null_rows", "r_null_rows", "matched_keys", "join_rows")
        .as[(Long, Long, Long, Long)].head()
      p shouldBe ((2L, 1L, 1L, 2L))
    }
  }

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
}

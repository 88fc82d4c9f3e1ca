package graft.quality

import graft.SparkSpec

/** MutualInfo.score contract: U = 1 on an exact dependency, MI = 0
  * on exact independence, MI = H on identical columns, NULL rows
  * invisible.
  */
class MutualInfoSpec extends SparkSpec {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
    MutualInfo.score(df, a, b)
      .select("n", "mi", "h_lhs", "h_rhs", "u")
      .as[(Long, Double, Double, Double, Option[Double])].head()

  describe("MutualInfo.score") {
    it("scores an exact dependency U = 1 (and MI = H(rhs))") {
      val df = Seq((1L, "x"), (2L, "y"), (3L, "z"), (1L, "x"))
        .toDF("k", "v")
      val (n, mi, _, hb, u) = one(df, "k", "v")
      n shouldBe 4L
      u shouldBe Some(1.0)
      mi shouldBe hb
    }
    it("scores exact independence MI = 0, U = 0") {
      // uniform product distribution: every (a, b) combo once
      val df = (for { a <- Seq("p", "q"); b <- Seq("x", "y") } yield (a, b))
        .toDF("a", "b")
      val (_, mi, _, _, u) = one(df, "a", "b")
      mi shouldBe 0.0
      u shouldBe Some(0.0)
    }
    it("MI of a column with itself is its entropy") {
      val df = Seq("x", "x", "y", "z").map(v => (v, v)).toDF("a", "b")
      val (_, mi, ha, hb, _) = one(df, "a", "b")
      mi shouldBe ha
      ha shouldBe hb
    }
    it("ignores NULL rows and nulls u for a constant rhs") {
      val df = Seq((Some("a"), Some("c")), (Some("b"), Some("c")),
        (None, Some("c")), (Some("a"), None)).toDF("a", "b")
      val (n, mi, _, hb, u) = one(df, "a", "b")
      n shouldBe 2L // only fully non-null rows
      hb shouldBe 0.0
      mi shouldBe 0.0
      u shouldBe None
    }
  }
}

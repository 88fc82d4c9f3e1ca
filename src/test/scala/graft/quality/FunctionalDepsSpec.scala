package graft.quality

import graft.SparkSpec

/** FD-discovery contract (FunctionalDeps.check): holds/violation
  * arithmetic on a hand fixture, several candidates in one pass,
  * and the documented NULL-invisibility semantics.
  */
class FunctionalDepsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some("a"), "x"),
    (2L, Some("b"), "x"),
    (2L, Some("b"), "x"), // duplicate row — no new combination
    (3L, Some("b"), "y"), // id 3 breaks nothing; (b→?) breaks rhs→lhs
    (4L, None, "z")       // NULL lhs for the (name → tag) candidate
  ).toDF("id", "name", "tag")

  private def check(cands: (String, String)*) =
    FunctionalDeps.check(rows, cands.toSeq)
      .select("lhs", "rhs", "n_lhs", "n_pairs", "n_violations", "holds")
      .as[(String, String, Long, Long, Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  describe("FunctionalDeps.check") {
    it("reports holding and violated FDs from one pass") {
      check("id" -> "name", "name" -> "tag") shouldBe Seq(
        // id → name: 4 ids, 4 (id,name) pairs w/ non-null... id 4 has
        // NULL name → invisible to n_pairs, so 4 lhs vs 3 pairs
        ("id", "name", 4L, 3L, -1L, false),
        // name → tag: a→x, b→{x,y} → 2 lhs, 3 pairs, 1 violation
        ("name", "tag", 2L, 3L, 1L, false))
    }
    it("confirms a clean dependency") {
      val clean = Seq((1L, "x"), (2L, "y"), (2L, "y")).toDF("k", "v")
      FunctionalDeps.check(clean, Seq("k" -> "v"))
        .select("holds").as[Boolean].head() shouldBe true
    }
  }
}

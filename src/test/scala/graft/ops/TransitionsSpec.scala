package graft.ops

import graft.SparkSpec

/** Markov transition-matrix semantics (q154). */
class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, ms, event_id, state)
  private def run(rows: (Long, Long, Long, String)*) =
    Transitions.matrix(rows.toDF("user_id", "ms", "event_id", "state"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  it("counts adjacent pairs per user with a (start) opener") {
    val out = run(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "buy"),
      (2L, 10L, 4L, "view"), (2L, 20L, 5L, "click"), (2L, 30L, 6L, "view"))
    out(("(start)", "view")) shouldBe ((2L, 1.0))
    out(("view", "click")) shouldBe ((2L, 1.0))
    out(("click", "buy")) shouldBe ((1L, 0.5))
    out(("click", "view")) shouldBe ((1L, 0.5))
  }

  it("rows with one event per user only produce (start) transitions") {
    val out = run((1L, 5L, 1L, "a"), (2L, 5L, 2L, "b"))
    out shouldBe Map(
      ("(start)", "a") -> ((1L, 0.5)), ("(start)", "b") -> ((1L, 0.5)))
  }

  it("orders ties on event_id and never crosses users") {
    val out = run(
      (1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"), // same ms: a precedes b
      (2L, 10L, 3L, "c"))
    out(("a", "b")) shouldBe ((1L, 1.0))
    out.keySet should not contain (("b", "c"))
  }

  it("per-prev probabilities sum to 1") {
    val out = run(
      (1L, 1L, 1L, "x"), (1L, 2L, 2L, "y"), (1L, 3L, 3L, "z"),
      (2L, 1L, 4L, "x"), (2L, 2L, 5L, "z"))
    val byPrev = out.toSeq.groupBy(_._1._1)
    byPrev.foreach { case (_, rows) =>
      rows.map(_._2._2).sum shouldBe 1.0 +- 1e-9
    }
  }
}

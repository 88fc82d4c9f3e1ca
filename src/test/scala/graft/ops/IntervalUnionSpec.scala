package graft.ops

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class IntervalUnionSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Long)]) =
    IntervalUnion.coverage(rows.toDF("key", "start", "end", "id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)

  describe("IntervalUnion.coverage") {
    it("merges overlaps, counts islands, never double-counts") {
      // [0,10) ∪ [5,20) ∪ [30,40) → islands [0,20) and [30,40)
      val got = run(Seq(("u", 0L, 10L, 1L), ("u", 5L, 20L, 2L),
        ("u", 30L, 40L, 3L)))
      got shouldBe Seq(("u", 3L, 2L, 30L, 20L))
    }

    it("touching intervals merge (half-open semantics)") {
      val got = run(Seq(("u", 0L, 10L, 1L), ("u", 10L, 15L, 2L)))
      got shouldBe Seq(("u", 2L, 1L, 15L, 15L))
    }

    it("containment and duplicate intervals collapse") {
      val got = run(Seq(("u", 0L, 100L, 1L), ("u", 10L, 20L, 2L),
        ("u", 0L, 100L, 3L)))
      got shouldBe Seq(("u", 3L, 1L, 100L, 100L))
    }

    it("an early long interval swallows later short starts (running max, not lag)") {
      // [0,50) then [10,20) then [30,60): lag(end) alone would
      // wrongly break at 30 > 20; the running max keeps one island
      val got = run(Seq(("u", 0L, 50L, 1L), ("u", 10L, 20L, 2L),
        ("u", 30L, 60L, 3L)))
      got shouldBe Seq(("u", 3L, 1L, 60L, 60L))
    }

    it("keys are independent") {
      val got = run(Seq(("a", 0L, 10L, 1L), ("b", 0L, 5L, 2L),
        ("b", 20L, 25L, 3L)))
      got shouldBe Seq(("a", 1L, 1L, 10L, 10L),
        ("b", 2L, 2L, 10L, 5L))
    }
  }
}

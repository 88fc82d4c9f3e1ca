package graft.ops

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class Scd3Spec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private val current = Seq(
    (1L, "GOLD", Some("SILVER")),   // carries older history already
    (2L, "SILVER", None),
    (3L, "BRONZE", None)).toDF("k", "tier", "prev_value")

  describe("Snapshot.scd3") {
    it("shifts changed values into prev_value, keeps the rest") {
      val batch = Seq((1L, "GOLD"), (2L, "GOLD"), (4L, "NEW"))
        .toDF("k", "tier")
      val out = Snapshot.scd3(current, batch, Seq("k"), "tier")
        .orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      out shouldBe Array(
        (1L, "GOLD", Some("SILVER")),  // unchanged: history kept
        (2L, "GOLD", Some("SILVER")),  // changed: old value shifted
        (3L, "BRONZE", None),          // absent from batch: retained
        (4L, "NEW", None))             // new key: no history
    }

    it("null-safe compare: null→value and value→null are changes") {
      val cur = Seq((1L, null: String, None: Option[String]),
        (2L, "A", None: Option[String])).toDF("k", "tier", "prev_value")
      val batch = Seq((1L, "B"), (2L, null: String)).toDF("k", "tier")
      val out = Snapshot.scd3(cur, batch, Seq("k"), "tier")
        .orderBy("k").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)),
          Option(r.getString(2))))
      out shouldBe Array((1L, Some("B"), None),
        (2L, None, Some("A")))
    }

    it("is idempotent on a repeated identical batch") {
      val batch = Seq((2L, "GOLD")).toDF("k", "tier")
      val once = Snapshot.scd3(current, batch, Seq("k"), "tier")
      val twice = Snapshot.scd3(once, batch, Seq("k"), "tier")
        .orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      twice shouldBe Array((1L, "GOLD", Some("SILVER")),
        (2L, "GOLD", Some("SILVER")), (3L, "BRONZE", None))
    }
  }
}

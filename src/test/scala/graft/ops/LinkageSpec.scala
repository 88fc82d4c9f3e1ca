package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class LinkageSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private val clean = Seq("red widget", "blue bolt", "small ring")
    .toDF("name")

  describe("Linkage.bestMatch") {
    it("links typo variants to the right entity with the distance") {
      val dirty = Seq(
        (1L, "red widget"), // exact → dist 0
        (2L, "red widgetx"), // append → 1
        (3L, "zlue bolt"), // first-char typo → 1
        (4L, "small rin"), // last-char drop → 1
        (5L, "green gizmo")) // no candidate within 2 → unmatched
        .toDF("id", "dname")
      val out = Linkage.bestMatch(dirty, clean, "id", "dname", "name", 2)
        .orderBy("id").collect()
      out.map(r => (r.getLong(0), Option(r.getString(2)), r.getInt(3)))
        .toSeq shouldBe Seq(
        (1L, Some("red widget"), 0),
        (2L, Some("red widget"), 1),
        (3L, Some("blue bolt"), 1),
        (4L, Some("small ring"), 1),
        (5L, None, -1))
    }

    it("multi-pass blocking survives an edge typo that breaks one key") {
      // first word broken AND last word intact → still a candidate
      val dirty = Seq((1L, "xed widget")).toDF("id", "dname")
      Linkage.bestMatch(dirty, clean, "id", "dname", "name", 2)
        .head().getString(2) shouldBe "red widget"
    }

    it("ties break on the lexicographically smallest name") {
      val c2 = Seq("ab x", "ab y").toDF("name")
      // "ab z" is distance 1 from both
      val dirty = Seq((1L, "ab z")).toDF("id", "dname")
      Linkage.bestMatch(dirty, c2, "id", "dname", "name", 2)
        .head().getString(2) shouldBe "ab x"
    }

    it("candidates are bounded by blocking (no cross join in the plan)") {
      val dirty = Seq((1L, "red widget")).toDF("id", "dname")
      val plan = Linkage.bestMatch(dirty, clean, "id", "dname", "name", 2)
        .queryExecution.executedPlan.toString
      plan should not include "CartesianProduct"
      plan should not include "BroadcastNestedLoopJoin"
    }
  }
}

package graft.sources

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class JoinabilitySpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private def fixture = Map(
    "parent" -> (1L to 100L).map(i => (i, s"p$i")).toDF("pk", "name"),
    "child" -> (1L to 400L).map(i => (i, i % 50 + 1)).toDF("id", "fk"),
    "stranger" -> (1000L to 1019L).toDF("sk").select(col("sk"),
      lit(null).cast("long").as("empty")))

  private val cands = Seq("parent" -> "pk", "child" -> "fk",
    "child" -> "id", "stranger" -> "sk", "stranger" -> "empty")

  describe("Joinability") {
    it("finds the FK: child.fk fully contained in parent.pk") {
      val rep = Joinability.report(Joinability.states(fixture, cands))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      val fk = rep.find(r => r._1 == "child.fk" && r._2 == "parent.pk").get
      fk._3 shouldBe 50
      fk._4 shouldBe 100
      fk._5 shouldBe 50
      fk._6 shouldBe 1.0
      fk._7 shouldBe 0.5
    }

    it("overlapping ranges report partial containment") {
      val rep = Joinability.report(Joinability.states(fixture, cands))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4)))
      // child.id 1..400 ∩ parent.pk 1..100 = 100
      rep.find(r => r._1 == "child.id" && r._2 == "parent.pk")
        .get._3 shouldBe 100
    }

    it("disjoint and all-null columns never pair") {
      val rep = Joinability.report(Joinability.states(fixture, cands))
        .collect().map(r => (r.getString(0), r.getString(1)))
      rep.exists(r => r._1.startsWith("stranger") ||
        r._2.startsWith("stranger")) shouldBe false
    }

    it("pair matrix is strictly upper-triangular (no self/dup pairs)") {
      val rep = Joinability.report(Joinability.states(fixture, cands))
        .collect().map(r => (r.getString(0), r.getString(1)))
      all(rep.map(r => r._1 < r._2)) shouldBe true
      rep.distinct.length shouldBe rep.length
    }
  }
}

package graft.quality

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class ImputeSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private val df = Seq(
    ("a", Some(1)), ("a", Some(1)), ("a", Some(2)), ("a", None),
    ("b", Some(5)), ("b", None), ("b", None),
    ("c", None)).toDF("g", "v")

  describe("Impute.modeReport") {
    it("elects the mode with share and counts the holes") {
      val rows = Impute.modeReport(df, "g", "v").orderBy("group_key")
        .collect()
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) shouldBe
        Array(("a", 4L, 1L), ("b", 3L, 2L), ("c", 1L, 1L))
      rows(0).getInt(3) shouldBe 1
      rows(0).getDouble(4) shouldBe 2.0 / 3 +- 1e-6
      rows(1).getInt(3) shouldBe 5
      rows(2).isNullAt(3) shouldBe true
    }

    it("ties break to the smallest value") {
      val t = Seq(("g", Some(7)), ("g", Some(3)), ("g", Some(7)),
        ("g", Some(3))).toDF("g", "v")
      Impute.modeReport(t, "g", "v").collect().head.getInt(3) shouldBe 3
    }
  }

  describe("Impute.modeFill") {
    it("fills holes with the group mode, flags them, leaves unsupported groups null") {
      val out = Impute.modeFill(df, "g", "v")
        .orderBy("g", "v").collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) None else
          Some(r.getInt(1)), r.getBoolean(2)))
      out.count(_._3) shouldBe 3
      out.filter(_._1 == "b").map(_._2).toSeq shouldBe
        Seq(Some(5), Some(5), Some(5))
      out.filter(_._1 == "c").map(_._2).toSeq shouldBe Seq(None)
    }

    it("never rewrites non-null values") {
      val out = Impute.modeFill(df, "g", "v")
        .filter(!$"was_imputed" && $"v".isNotNull).count()
      out shouldBe 4
    }
  }
}

package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FixedWidthProportionsSpec extends SparkSpec {
  import spark.implicits._

  private val layout = Seq(
    FixedWidth.Field("id", 1, 5, numeric = true),
    FixedWidth.Field("name", 6, 8, numeric = false))

  describe("FixedWidth") {
    it("round-trips values through render + parse") {
      val in = Seq((42L, "ab c"), (7L, "xyz")).toDF("id", "name")
      val lines = FixedWidth.render(in, layout).select("line")
        .as[String].collect().sorted
      lines shouldBe Array("00007xyz     ", "00042ab c    ")
      val back = FixedWidth.parse(
        lines.toSeq.toDF("line"), "line", layout)
        .select(col("id").cast("long"), col("name"), col("line_ok"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getBoolean(2))).toSet
      back shouldBe Set((42L, "ab c", true), (7L, "xyz", true))
    }
    it("raises on field overflow instead of silently truncating") {
      val in = Seq((123456L, "ok")).toDF("id", "name")
      val ex = intercept[Exception] {
        FixedWidth.render(in, layout).collect()
      }
      ex.getMessage should include ("overflows")
    }
    it("flags short lines instead of inventing data") {
      val out = FixedWidth.parse(Seq("00001ab").toDF("line"),
        "line", layout).collect().head
      out.getBoolean(out.fieldIndex("line_ok")) shouldBe false
    }
    it("rejects layouts with gaps or overlaps") {
      an[IllegalArgumentException] should be thrownBy
        FixedWidth.render(Seq((1L, "a")).toDF("id", "name"), Seq(
          FixedWidth.Field("id", 1, 5, numeric = true),
          FixedWidth.Field("name", 7, 8, numeric = false)))
    }
  }

  describe("Proportions.wilson") {
    it("matches the textbook interval for k=8, n=10 at z=1.96") {
      val df = (1 to 10).map(i => ("g", if (i <= 8) 1 else 0))
        .toDF("g", "hit")
      val r = graft.quality.Proportions.wilson(df).collect().head
      r.getDouble(r.fieldIndex("rate")) shouldBe 0.8
      // Wilson 95% for 8/10: ~(0.4902, 0.9433)
      r.getDouble(r.fieldIndex("ci_lo")) shouldBe (0.4902 +- 0.001)
      r.getDouble(r.fieldIndex("ci_hi")) shouldBe (0.9433 +- 0.001)
    }
    it("stays inside [0,1] at the boundary rates where Wald collapses") {
      val df = Seq(("all", 1), ("all", 1), ("none", 0), ("none", 0))
        .toDF("g", "hit")
      val out = graft.quality.Proportions.wilson(df).collect()
        .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5)))
        .toMap
      out("all")._1 should be > 0.0 // nondegenerate lower bound
      out("all")._2 shouldBe 1.0
      out("none")._1 shouldBe 0.0
      out("none")._2 should be < 1.0
    }
  }
}

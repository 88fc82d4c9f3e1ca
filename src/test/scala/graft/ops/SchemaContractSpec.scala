package graft.ops

import org.apache.spark.sql.types.LongType
import graft.SparkSpec

class SchemaContractSpec extends SparkSpec {
  import SchemaContract._

  private lazy val target = Seq("id", "v")

  private def drifted = {
    import spark.implicits._
    Seq((1L, "10", Some(1)), (2L, "x", None), (3L, "30", Some(3)))
      .toDF("id", "v", "extra")
  }

  describe("columns contract") {
    it("freeze throws on unknown columns") {
      a[ContractViolation] should be thrownBy
        applyColumns(target, drifted, Freeze)
    }
    it("discard_value drops the unknown column") {
      applyColumns(target, drifted, DiscardValue).columns.toSeq shouldBe target
    }
    it("discard_row drops only rows carrying a value in unknown columns") {
      val out = applyColumns(target, drifted, DiscardRow)
      out.columns.toSeq shouldBe target
      out.count() shouldBe 1 // only id=2 has extra = null
    }
    it("evolve keeps everything") {
      applyColumns(target, drifted, Evolve).columns should contain("extra")
    }
  }

  describe("data_type contract") {
    val types = Map("v" -> LongType)
    it("freeze throws on uncastable values") {
      a[ContractViolation] should be thrownBy
        applyTypes(types, drifted, Freeze).collect()
    }
    it("discard_value nulls failed casts") {
      val out = applyTypes(types, drifted, DiscardValue)
      out.filter(out("v").isNull).count() shouldBe 1
      out.count() shouldBe 3
    }
    it("discard_row drops rows with failed casts") {
      applyTypes(types, drifted, DiscardRow).count() shouldBe 2
    }
  }

  describe("violationProbe") {
    it("counts both entities in one row") {
      val row = violationProbe(target, Map("v" -> LongType), drifted).head()
      row.getLong(0) shouldBe 3 // total
      row.getLong(1) shouldBe 2 // rows carrying extra values
      row.getLong(2) shouldBe 1 // uncastable v
    }
  }

  describe("evolveUnion") {
    it("null-fills missing columns on either side") {
      import spark.implicits._
      val a = Seq((1L, "a")).toDF("id", "x")
      val b = Seq((2L, 9.0)).toDF("id", "y")
      val u = evolveUnion(a, b)
      u.columns.toSet shouldBe Set("id", "x", "y")
      u.count() shouldBe 2
    }
  }
}

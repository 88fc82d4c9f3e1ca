package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
    (2L, Array(127.0f, -127.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  describe("Quantize.int8") {
    it("codes stay in [-127, 127] and extremes hit exactly ±127") {
      val out = Quantize.corpus(vecs, "embedding")
        .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
      out.values.flatten.foreach { q =>
        q should be >= -127; q should be <= 127
      }
      out(1L).head shouldBe 64   // 0.5 / (1.0/127) = 63.5 → floor(+0.5) = 64
      out(1L)(1) shouldBe -127   // the max-magnitude component
      out(2L).take(2) shouldBe Seq(127, -127)
    }
    it("an all-zero vector quantizes to all zeros with scale 0 (exact)") {
      val r = Quantize.corpus(vecs, "embedding").filter($"vec_id" === 3L)
        .select($"codes", $"scale").head()
      r.getSeq[Int](0) shouldBe Seq(0, 0, 0, 0)
      r.getDouble(1) shouldBe 0.0
    }
    it("dequantization error is bounded by scale/2 componentwise") {
      val errs = vecs.select($"vec_id",
          Quantize.dequantError($"embedding").as("err"),
          Quantize.scaleOf($"embedding").as("s"))
        .as[(Long, Double, Double)].collect()
      errs.foreach { case (_, err, s) =>
        err should be <= s / 2 + 1e-12
      }
    }
    it("round-trips through dequant within the bound") {
      val rt = Quantize.corpus(vecs, "embedding")
        .select($"embedding", Quantize.dequant($"codes", $"scale").as("back"),
          Quantize.scaleOf($"embedding").as("s"))
        .select(array_max(zip_with($"embedding", $"back",
          (x, b) => abs(b - x.cast("double")))).as("maxerr"), $"s")
        .as[(Double, Double)].collect()
      rt.foreach { case (e, s) => e should be <= s / 2 + 1e-12 }
    }
    it("is a pure projection — no exchange in the plan") {
      val plan = Quantize.corpus(vecs, "embedding")
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
    }
  }
}

package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class ScalerSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(0.0f, 10.0f)),
    (2L, Seq(2.0f, 20.0f)),
    (3L, Seq(4.0f, 30.0f))).toDF("id", "embedding")

  describe("Scaler") {
    it("fit computes exact per-dimension mean/var") {
      val st = Scaler.fit(vecs, "embedding").orderBy("pos").collect()
      st.map(_.getInt(0)).toSeq shouldBe Seq(0, 1)
      st(0).getDouble(2) shouldBe 2.0 // mean dim0
      st(0).getDouble(3) shouldBe (8.0 / 3.0) +- 1e-12 // var dim0
      st(1).getDouble(2) shouldBe 20.0
    }

    it("transform standardizes to zero mean / unit variance") {
      val st = Scaler.fit(vecs, "embedding")
      val scaled = Scaler.transform(vecs, "embedding", st)
        .select(explode(col("scaled")).as("z"))
      val agg = scaled.agg(
        round(sum(col("z").cast("decimal(28,12)")).cast("double"), 9),
        round(sum((col("z") * col("z")).cast("decimal(28,12)"))
          .cast("double"), 9)).head()
      agg.getDouble(0) shouldBe 0.0 +- 1e-9 // Σz = 0 per dim
      agg.getDouble(1) shouldBe 6.0 +- 1e-9 // Σz² = n per dim × 2 dims
    }

    it("transform is a shuffle-free projection") {
      val st = Scaler.fit(vecs, "embedding")
      val plan = Scaler.transform(vecs, "embedding", st)
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
    }

    it("zero-variance dimension does not divide by zero") {
      val const = Seq((1L, Seq(5.0f)), (2L, Seq(5.0f))).toDF("id", "embedding")
      val out = Scaler.transform(const, "embedding", Scaler.fit(const, "embedding"))
        .select(element_at(col("scaled"), 1)).as[Double].collect()
      all(out) shouldBe 0.0
    }
  }
}

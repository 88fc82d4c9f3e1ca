package graft.quality

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  describe("Drift.binCol") {
    it("clamps out-of-range values into the edge bins") {
      import org.apache.spark.sql.functions.col
      val out = Seq(-5.0, 0.0, 9.9, 10.0, 99.9, 100.0, 250.0)
        .toDF("v").select(Drift.binCol(col("v"), 0.0, 100.0, 10).as("b"))
        .as[Long].collect()
      out shouldBe Array(0L, 0L, 0L, 1L, 9L, 9L, 9L)
    }
  }

  describe("Drift.psi") {
    it("is ~zero for identical distributions and grows with shift") {
      val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
      val same = Drift.psi(base, base, "v", 0.0, 100.0, 10)
        .agg(org.apache.spark.sql.functions.sum("psi_contrib"))
        .as[Double].head()
      same shouldBe 0.0 +- 1e-9
      val shifted = (1 to 1000).map(i => (i % 100).toDouble + 50.0).toDF("v")
      val moved = Drift.psi(base, shifted, "v", 0.0, 100.0, 10)
        .agg(org.apache.spark.sql.functions.sum("psi_contrib"))
        .as[Double].head()
      moved should be > 0.2
    }
    it("emits every bin, including empty ones, and ignores nulls") {
      val base = Seq[java.lang.Double](5.0, 15.0, null).toDF("v")
      val cur = Seq[java.lang.Double](95.0).toDF("v")
      val rows = Drift.psi(base, cur, "v", 0.0, 100.0, 10).collect()
      rows.length shouldBe 10
      rows.map(_.getAs[Long]("n_base")).sum shouldBe 2L
      rows.map(_.getAs[Long]("n_cur")).sum shouldBe 1L
    }
  }
}

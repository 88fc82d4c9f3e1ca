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

  describe("Drift.chiSquare") {
    it("computes per-category contributions and the quantized total") {
      val base = (Seq.fill(8)("a") ++ Seq.fill(2)("b")).toDF("c")
      val cur = (Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq("c")).toDF("c")
      val rows = Drift.chiSquare(base, cur, "c").orderBy("category")
        .select("category", "n_base", "n_cur", "expected", "contrib",
          "chi2_total")
        .as[(String, Long, Long, Double, Double, Double)].collect()
      rows(0) shouldBe (("a", 8L, 5L, 8.0, 1.125, 3.125))
      rows(1) shouldBe (("b", 2L, 4L, 2.0, 2.0, 3.125))
      // category new in `cur`: visible with n_base = 0, contributes 0
      rows(2) shouldBe (("c", 0L, 1L, 0.0, 0.0, 3.125))
    }
    it("is zero when the mix is unchanged") {
      val base = (Seq.fill(6)("x") ++ Seq.fill(4)("y")).toDF("c")
      val total = Drift.chiSquare(base, base, "c")
        .select("chi2_total").as[Double].head()
      total shouldBe 0.0
    }
  }
}

package graft.ann

import graft.SparkSpec

class PcaPowerSpec extends SparkSpec {
  import spark.implicits._

  describe("PcaPower.topComponent") {
    it("finds the dominant variance direction") {
      // variance lives on dim 0 (spread ±10); dim 1 is noise ±1
      val vecs = (1 to 40).map { i =>
        Array((if (i % 2 == 0) 10f else -10f), (i % 3 - 1).toFloat)
      }.toDF("v")
      val out = PcaPower.topComponent(spark, vecs, "v", iters = 5)
        .collect().sortBy(_.getAs[Long]("d"))
      math.abs(out(0).getAs[Double]("loading")) shouldBe 1.0 +- 0.01
      math.abs(out(1).getAs[Double]("loading")) shouldBe 0.0 +- 0.05
      // nearly all variance explained by the component
      out(0).getAs[Double]("eig_share") shouldBe 1.0 +- 0.01
    }
    it("fast (CovMoments) and exact covariance paths agree to 9dp") {
      // deterministic anisotropic cloud, multi-partition so partial
      // merges actually happen; d = 6 exercises the full outer loop
      val vecs = (1 to 120).map { i =>
        Array.tabulate(6)(k =>
          (math.sin(i * (k + 1) * 0.37) * (6 - k) + k * 0.01).toFloat)
      }.toDF("v").repartition(7)
      def run(exact: Boolean) =
        PcaPower.topComponent(spark, vecs, "v", iters = 5, exact = Some(exact))
          .collect().sortBy(_.getAs[Long]("d"))
          .map(r => (r.getAs[Long]("d"), r.getAs[Double]("loading"),
            r.getAs[Double]("eig_share")))
      val e = run(exact = true)
      val f = run(exact = false)
      // loadings are 9dp-rounded each iteration and eig_share 6dp:
      // the double-sum path must land on the identical quantized
      // values for this well-conditioned fixture
      f shouldBe e
    }
    it("auto mode switches exactly at ExactWidthCutoff; explicit wins") {
      def fixture(d: Int) = (1 to 4).map(i =>
        Array.tabulate(d)(k => (i * (k + 1) % 7).toFloat)).toDF("v")
      val cut = PcaPower.ExactWidthCutoff
      PcaPower.resolveExact(fixture(cut), "v", None) shouldBe true
      PcaPower.resolveExact(fixture(cut + 1), "v", None) shouldBe false
      // explicit overrides in both directions, and empty input is exact
      PcaPower.resolveExact(fixture(cut + 1), "v", Some(true)) shouldBe true
      PcaPower.resolveExact(fixture(cut), "v", Some(false)) shouldBe false
      PcaPower.resolveExact(fixture(2).limit(0), "v", None) shouldBe true
    }
    it("fast and exact paths agree to the quantized digits at d=64 " +
        "and d=256") {
      // the widths VERDICT r9 asked pinned: the oracle fixture width
      // (64, auto = exact) and a production width past the cutoff
      // (256, auto = moments); multi-partition so partials merge
      for (d <- Seq(64, 256)) {
        val vecs = (1 to 24).map { i =>
          Array.tabulate(d)(k =>
            (math.sin(i * (k + 1) * 0.37) * ((k % 7) + 1) * 0.5).toFloat)
        }.toDF("v").repartition(5)
        def run(exact: Boolean) =
          PcaPower.topComponent(spark, vecs, "v", iters = 3,
              exact = Some(exact))
            .collect().sortBy(_.getAs[Long]("d"))
            .map(r => (r.getAs[Long]("d"), r.getAs[Double]("loading"),
              r.getAs[Double]("eig_share")))
        run(exact = false) shouldBe run(exact = true)
      }
    }
    it("CovMoments buffer survives serialize/merge across partitions") {
      import org.apache.spark.sql.functions._
      val df = (1 to 100).map(i =>
        Array(i.toFloat, (2 * i).toFloat)).toDF("v").repartition(13)
      val m = df.agg(graft.functions.CovMoments.covMoments(col("v")).as("m"))
        .select("m.n", "m.s1", "m.s2").collect().head
      m.getAs[Long](0) shouldBe 100L
      // exact-integer moments surface as exact decimals (r11)
      val s1 = m.getSeq[java.math.BigDecimal](1).map(_.doubleValue).toSeq
      val s2 = m.getSeq[java.math.BigDecimal](2).map(_.doubleValue).toSeq
      s1 shouldBe Seq(5050.0, 10100.0)
      // Σx² = 338350, Σx·2x = 676700, Σ(2x)² = 1353400
      s2 shouldBe Seq(338350.0, 676700.0, 676700.0, 1353400.0)
    }
    it("CovMoments 128-bit flush lane: domain-edge components " +
        "(|x| = 3000) stay exact, out-of-domain fails loudly") {
      import org.apache.spark.sql.functions._
      // |k| = 3e9 → every row's maxK² = 9e18 exhausts the long
      // headroom, forcing the flush path on each update
      val df = (1 to 4).map(_ => Array(3000f, -3000f)).toDF("v")
        .repartition(2)
      val m = df.agg(graft.functions.CovMoments.covMoments(col("v")).as("m"))
        .select("m.n", "m.s1", "m.s2").collect().head
      m.getAs[Long](0) shouldBe 4L
      m.getSeq[java.math.BigDecimal](1).map(_.doubleValue).toSeq shouldBe
        Seq(12000.0, -12000.0)
      m.getSeq[java.math.BigDecimal](2).map(_.doubleValue).toSeq shouldBe
        Seq(3.6e7, -3.6e7, -3.6e7, 3.6e7)
      val big = Seq(Tuple1(Array(3001f, 0f))).toDF("v")
      val e = intercept[org.apache.spark.SparkException] {
        big.agg(graft.functions.CovMoments.covMoments(col("v"))).collect()
      }
      e.getMessage should include("3000")
    }
    it("quantization tie values route through the exact HALF_UP rule " +
        "on both covariance paths") {
      import org.apache.spark.sql.functions._
      // doubles whose scaled value y = v*1e6 lands ON or NEXT TO a .5
      // tie: 5e-7 scales to 0.49999999999999994 (naive floor(y+0.5)
      // picks 0; Spark round()'s shortest-decimal HALF_UP picks 1 —
      // the fast path's fallback band must catch it), 2.5e-6 is an
      // exact positive tie (HALF_UP → 3), -2.5e-6 an exact negative
      // tie (HALF_UP away from zero → -3, where floor(y+0.5) says -2)
      val vecs = Seq(
        Tuple1(Array(0.0000005d, -0.0000005d, 2.5e-6d, -2.5e-6d)),
        Tuple1(Array(1.5e-6d, 0.0000005d, -1.5e-6d, 2.5e-6d)),
        Tuple1(Array(1.0d, -0.5d, 0.25d, -0.125d))).toDF("v")
      def run(exact: Boolean) =
        PcaPower.topComponent(spark, vecs, "v", iters = 2,
            exact = Some(exact))
          .collect().sortBy(_.getAs[Long]("d"))
          .map(r => (r.getAs[Long]("d"), r.getAs[Double]("loading"),
            r.getAs[Double]("eig_share")))
      run(exact = false) shouldBe run(exact = true)
      // and the moments themselves carry the HALF_UP quantization:
      // Σx over the first column = round(.5)+round(1.5)+round(1e6)
      // = 1 + 2 + 1000000 at scale 1e-6
      val m = vecs.agg(graft.functions.CovMoments.covMoments(col("v"))
        .as("m")).select("m.s1").collect().head
        .getSeq[java.math.BigDecimal](0)
      m.head.movePointRight(6).longValueExact() shouldBe
        (1L + 2L + 1000000L)
      // second column: round(-.5) + round(.5) + round(-5e5)
      m(1).movePointRight(6).longValueExact() shouldBe
        (-1L + 1L - 500000L)
    }
    it("splits an isotropic pair evenly in eig_share") {
      // two equal-variance independent dims → share ≈ 0.5
      val vecs = (1 to 64).map { i =>
        Array((i % 2 * 2 - 1).toFloat, ((i / 2) % 2 * 2 - 1).toFloat)
      }.toDF("v")
      val r = PcaPower.topComponent(spark, vecs, "v", iters = 5)
        .collect().head
      r.getAs[Double]("eig_share") shouldBe 0.5 +- 0.05
    }
  }
}

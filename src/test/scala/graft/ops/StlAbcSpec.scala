package graft.ops

import graft.SparkSpec

class StlAbcSpec extends SparkSpec {
  import spark.implicits._

  describe("Stl.decompose") {
    // 21 gap-free days of a flat-10 series with weekday 0 spiking +7
    val series = (0L until 21L).map(d =>
      ("g", d, if (d % 7 == 0) 17L else 10L)).toDF("g", "day", "x")

    it("reconstructs x exactly in scaled space where trend exists") {
      val out = Stl.decompose(series, "g", "day", "x").collect()
      out.filter(!_.isNullAt(3)).foreach { r =>
        val x = r.getAs[Long]("x")
        (r.getAs[Long]("trend_c7") * 2 + r.getAs[Long]("seasonal_m14") +
          r.getAs[Long]("resid_m14")) shouldBe x * 14
      }
    }
    it("finds the weekly spike in the seasonal, not the trend") {
      val out = Stl.decompose(series, "g", "day", "x").collect()
      val mid = out.filter(r => !r.isNullAt(3))
      // trend_c7 = 7-day sum = 6·10 + 17 = 77 everywhere (flat trend)
      mid.foreach(_.getAs[Long]("trend_c7") shouldBe 77L)
      val spikes = mid.filter(_.getAs[Long]("day") % 7 == 0)
      val flats = mid.filter(_.getAs[Long]("day") % 7 != 0)
      // seasonal_m14 = 14·(x − 11): spike day +84, flat days −14
      spikes.foreach(_.getAs[Long]("seasonal_m14") shouldBe 84L)
      flats.foreach(_.getAs[Long]("seasonal_m14") shouldBe -14L)
      // a clean periodic series leaves zero residual
      mid.foreach(_.getAs[Long]("resid_m14") shouldBe 0L)
    }
    it("nulls trend on the 3-day edges") {
      val out = Stl.decompose(series, "g", "day", "x").collect()
      out.count(_.isNullAt(3)) shouldBe 6 // 3 head + 3 tail
    }
  }

  describe("Abc.classify") {
    it("cuts the head at 70% cumulative share") {
      // one 70-cent whale, three 10-cent minnows
      val totals = Seq(("m", 1L, 70L), ("m", 2L, 10L), ("m", 3L, 10L),
        ("m", 4L, 10L)).toDF("g", "ent", "cents")
      val out = Abc.classify(totals, "g", "ent", "cents").collect()
        .map(r => r.getAs[String]("abc_class") ->
          (r.getAs[Long]("n_entities"), r.getAs[Long]("cents"))).toMap
      out("A") shouldBe ((1L, 70L))  // whale: cum_before 0 < 70
      out("B") shouldBe ((2L, 20L))  // 70 < 90 and 80 < 90
      out("C") shouldBe ((1L, 10L))  // cum_before 90
    }
    it("splits equal totals across a cut deterministically") {
      val totals = Seq(("m", 2L, 50L), ("m", 1L, 50L))
        .toDF("g", "ent", "cents")
      val out = Abc.classify(totals, "g", "ent", "cents",
          cutA = 40, cutB = 90).collect()
        .map(r => r.getAs[String]("abc_class") ->
          r.getAs[Long]("n_entities")).toMap
      out shouldBe Map("A" -> 1L, "B" -> 1L)
    }
  }

  describe("quality.DpNoise") {
    import org.apache.spark.sql.functions._
    it("noise is deterministic per key and scales with b") {
      val df = Seq(1L, 2L, 3L).toDF("k")
      val n1 = df.select(graft.quality.DpNoise.laplaceMu(col("k"), 1)
        .as("z")).as[Long].collect()
      val n1b = df.select(graft.quality.DpNoise.laplaceMu(col("k"), 1)
        .as("z")).as[Long].collect()
      val n3 = df.select(graft.quality.DpNoise.laplaceMu(col("k"), 3)
        .as("z")).as[Long].collect()
      n1 shouldBe n1b
      n3 shouldBe n1.map(_ * 3)
    }
    it("a secret salt changes the draw; the same salt reproduces it") {
      val df = spark.range(1, 201).toDF("k")
      def draws(salt: Long) = df.select(
        graft.quality.DpNoise.laplaceMu(col("k"), 1, salt).as("z"))
        .as[Long].collect().toSeq
      val unsalted = draws(0L)
      val salted = draws(982451653L)
      (salted == unsalted) shouldBe false // holder of the cells alone
      draws(982451653L) shouldBe salted // but same salt → same release
    }
    it("extreme salts and keys cannot overflow (salt folded mod P30 " +
        "before the add)") {
      // the pre-r10 fold evaluated key + salt BEFORE any pmod: a salt
      // near Long.MaxValue plus a large positive key overflowed under
      // ANSI arithmetic. Both operands now reduce mod P30 separately.
      val df = Seq(Long.MaxValue - 1L, Long.MaxValue / 2, 7L).toDF("k")
      for (salt <- Seq(Long.MaxValue, Long.MaxValue - 3L, 1L << 62)) {
        val z = df.select(graft.quality.DpNoise.laplaceMu(col("k"), 1, salt)
          .as("z")).as[Long].collect()
        val z2 = df.select(graft.quality.DpNoise.laplaceMu(col("k"), 1, salt)
          .as("z")).as[Long].collect()
        z shouldBe z2 // no overflow error, and still deterministic
      }
    }
    it("draws both signs and plausible Laplace magnitudes") {
      val df = spark.range(1, 2001).toDF("k")
      val z = df.select(graft.quality.DpNoise.laplaceMu(col("k"), 1)
        .as("z")).as[Long].collect()
      z.count(_ > 0) should be > 700
      z.count(_ < 0) should be > 700
      // mean |Laplace(1)| = 1 → µ-scaled ≈ 1e6
      val meanAbs = z.map(v => math.abs(v).toDouble).sum / z.length
      meanAbs shouldBe 1e6 +- 2e5
    }
  }
}

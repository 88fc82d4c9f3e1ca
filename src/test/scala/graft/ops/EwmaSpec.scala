package graft.ops

import graft.SparkSpec

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  describe("Ewma.smooth") {
    it("replays the fixed-point recursion exactly (alpha = 1/4)") {
      // s0 = 100e6; s1 = (100e6*3 + 200e6)//4 = 125e6
      // s2 = (125e6*3 + 0)//4 = 93_750_000
      val df = Seq(("a", 0L, 100L), ("a", 1L, 200L), ("a", 2L, 0L))
        .toDF("g", "t", "x")
      val r = Ewma.smooth(df, 1, 4).orderBy("t").collect()
      r.map(_.getAs[Long]("level_fp")).toSeq shouldBe
        Seq(100000000L, 125000000L, 93750000L)
      r(2).getAs[Double]("level") shouldBe 93.75
    }

    it("floor division truncates, never rounds") {
      // s0 = 1e6; s1 = (1e6*3 + 2e6)//4 = 1_250_000
      // s2 = (1_250_000*3 + 1e6)//4 = 4_750_000//4 = 1_187_500
      // s3 = (1_187_500*3 + 0)//4 = 3_562_500//4 = 890_625
      val df = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 2L, 1L),
        ("a", 3L, 0L)).toDF("g", "t", "x")
      val r = Ewma.smooth(df, 1, 4).orderBy("t").collect()
      r(3).getAs[Long]("level_fp") shouldBe 890625L
    }

    it("smooths toward a level change slower than the raw series") {
      val df = (Seq.tabulate(5)(i => ("a", i.toLong, 0L)) ++
        Seq.tabulate(5)(i => ("a", (i + 5).toLong, 1000L)))
        .toDF("g", "t", "x")
      val r = Ewma.smooth(df, 1, 4).orderBy("t").collect()
      val lvl = r.map(_.getAs[Double]("level"))
      lvl(5) should be < 1000.0
      lvl(9) should be > lvl(5)
      lvl(9) should be < 1000.0
    }

    it("sorts by t regardless of input order and keeps series apart") {
      val df = Seq(("b", 1L, 10L), ("a", 0L, 5L), ("b", 0L, 20L))
        .toDF("g", "t", "x")
      val r = Ewma.smooth(df, 1, 2).orderBy("g", "t").collect()
      r.map(r0 => (r0.getString(0), r0.getAs[Long]("level_fp"))).toSeq shouldBe
        Seq(("a", 5000000L), ("b", 20000000L), ("b", 15000000L))
    }

    it("rejects alpha outside (0,1)") {
      val df = Seq(("a", 0L, 1L)).toDF("g", "t", "x")
      an[IllegalArgumentException] should be thrownBy Ewma.smooth(df, 4, 4)
    }
  }
}

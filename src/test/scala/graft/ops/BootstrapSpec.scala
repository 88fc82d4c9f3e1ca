package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Poisson-bootstrap CI semantics (q155). */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  it("weights are 0..9 with empirical mean ≈ 1 (Poisson(1))") {
    val df = (1L to 20000L).toDF("id")
      .select(Bootstrap.weight(col("id"), lit(0)).as("w"))
    val stats = df.agg(min("w"), max("w"), avg("w")).head()
    stats.getInt(0) should be >= 0
    stats.getInt(1) should be <= 9
    stats.getDouble(2) shouldBe 1.0 +- 0.05
    // and genuinely varies (not all ones)
    df.distinct().count() should be > 2L
  }

  it("weights are deterministic in (id, replicate)") {
    val df = Seq((42L, 7)).toDF("id", "b")
    val w1 = df.select(Bootstrap.weight(col("id"), col("b"))).head().getInt(0)
    val w2 = df.select(Bootstrap.weight(col("id"), col("b"))).head().getInt(0)
    w1 shouldBe w2
  }

  it("sumCi reports exact order statistics of the replicate totals") {
    val rows = (1L to 50L).map(i => ("g1", i, 2.5))
    val out = Bootstrap.sumCi(rows.toDF("g", "id", "v"), "g", "id", "v",
        b = 100)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    out.keySet shouldBe Set(0.05, 0.5, 0.95)
    // independent reference: replay the weights and rank on the driver
    val wcol = Bootstrap.weight(col("id"), col("rep"))
    val totals = rows.toDF("g", "id", "v")
      .select(col("id"), explode(sequence(lit(0), lit(99))).as("rep"))
      .select(col("rep"), wcol.as("w"))
      .collect().groupBy(_.getInt(0))
      .map { case (rep, rs) => rep -> rs.map(_.getInt(1)).sum * 2.5 }
      .toSeq.sortBy(t => (t._2, t._1)).map(_._2)
    out(0.05) shouldBe totals(4)
    out(0.5) shouldBe totals(49)
    out(0.95) shouldBe totals(94)
    // the CI straddles the unresampled total
    out(0.05) should be < 125.0
    out(0.95) should be > 125.0
  }

  it("rejects percentile sets that collide at the chosen B") {
    an[IllegalArgumentException] should be thrownBy
      Bootstrap.sumCi(Seq(("g", 1L, 1.0)).toDF("g", "id", "v"),
        "g", "id", "v", b = 10, ps = Seq(0.01, 0.05))
  }
}

package graft.quality

import graft.SparkSpec

/** Trailing z-score anomaly semantics (q156). */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // (series, day, value)
  private def run(rows: (String, Long, Double)*) =
    Anomaly.trailingZ(rows.toDF("series", "day", "value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
      .toMap

  it("flags a spike against a stable trailing window") {
    val base = (1L to 7L).map(d => ("m", d, 100.0))
    val out = run(base :+ (("m", 8L, 500.0)): _*)
    val (total, n, z, flag) = out(("m", 8L))
    total shouldBe 500.0
    n shouldBe 7L
    // zero-variance window → z is null even for an obvious spike:
    // variance guard, not a crash
    z shouldBe None
    flag shouldBe None
    val noisy = (1L to 7L).map(d => ("m", d, 100.0 + d)) // var > 0
    val out2 = run(noisy :+ (("m", 8L, 500.0)): _*)
    val (_, _, Some(z2), Some(f2)) = out2(("m", 8L))
    z2 should be > 3.0
    f2 shouldBe true
  }

  it("a normal day inside a noisy window is not anomalous") {
    val rows = Seq(("m", 1L, 90.0), ("m", 2L, 110.0), ("m", 3L, 95.0),
      ("m", 4L, 105.0), ("m", 5L, 100.0))
    val (_, _, Some(z), Some(flag)) = run(rows: _*)(("m", 5L))
    math.abs(z) should be < 3.0
    flag shouldBe false
  }

  it("the window excludes the current day and needs two reference days") {
    val out = run(("m", 1L, 100.0), ("m", 2L, 200.0), ("m", 3L, 100.0))
    out(("m", 1L))._2 shouldBe 0L // nothing trailing
    out(("m", 1L))._3 shouldBe None
    out(("m", 2L))._2 shouldBe 1L // one day: still null z
    out(("m", 2L))._3 shouldBe None
    out(("m", 3L))._2 shouldBe 2L
  }

  it("days beyond the 7-day range age out of the reference window") {
    val out = run(("m", 1L, 1000.0), ("m", 9L, 10.0), ("m", 10L, 12.0),
      ("m", 11L, 11.0))
    out(("m", 11L))._2 shouldBe 2L // day 1 aged out (range is [4, 10])
  }

  it("series are independent") {
    val out = run(("a", 1L, 1.0), ("b", 2L, 99.0), ("b", 3L, 1.0))
    out(("b", 3L))._2 shouldBe 1L // only b's own history counts
  }
}

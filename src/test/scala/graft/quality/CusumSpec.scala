package graft.quality

import graft.SparkSpec

/** CUSUM contract (Cusum.upwardShift): the windowed closed form
  * equals the textbook recursion S_t = max(0, S_{t-1} + d_t) replayed
  * by hand; slack suppresses small drift; the max(0,·) reset forgets
  * pre-dip history; baseline days never appear in the output.
  */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  // series "m": baseline days 0-1 at 10.00 → μ_base = 10.00
  private def rows(tail: Seq[Double]) =
    (Seq(10.0, 10.0) ++ tail).zipWithIndex
      .map { case (v, i) => ("m", i.toLong, v) }
      .toDF("series", "day", "value")

  private def run(tail: Seq[Double], slackCents: Long, alarmCents: Long) =
    Cusum.upwardShift(rows(tail), baselineDays = 2,
        slackCents = slackCents, alarmCents = alarmCents)
      .select("day", "s_plus", "alarm")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1).toSeq

  /** Textbook recursion in cents, for cross-checking the closed form. */
  private def naive(tail: Seq[Double], slackCents: Long): Seq[Double] =
    tail.scanLeft(0L) { (s, x) =>
      math.max(0L, s + (x * 100).round - 1000L - slackCents)
    }.drop(1).map(_ / 100.0)

  describe("Cusum.upwardShift") {
    it("matches the textbook recursion including the max(0,·) reset") {
      // up, deep dip (clamps at 0 — history forgotten), then up again
      val tail = Seq(14.0, 2.0, 14.0, 14.0)
      run(tail, slackCents = 100L, alarmCents = 500L).map(_._2) shouldBe
        naive(tail, 100L)
    }
    it("suppresses drift below the slack, accumulates above it") {
      // +0.5/day drift under κ=1.00 never accumulates
      run(Seq(10.5, 10.5, 10.5), 100L, 200L).map(_._2) shouldBe
        Seq(0.0, 0.0, 0.0)
      // +3/day over κ=1.00 accumulates 2/day and alarms past h=5.00
      run(Seq(13.0, 13.0, 13.0, 13.0), 100L, 500L) shouldBe Seq(
        (2L, 2.0, false), (3L, 4.0, false), (4L, 6.0, true), (5L, 8.0, true))
    }
    it("emits only monitored days (baseline rows excluded)") {
      run(Seq(13.0), 100L, 500L).map(_._1) shouldBe Seq(2L)
    }
  }
}

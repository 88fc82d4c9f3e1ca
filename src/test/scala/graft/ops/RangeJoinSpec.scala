package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  describe("RangeJoin.pointInInterval") {
    import spark.implicits._
    it("matches points to half-open intervals across bin boundaries") {
      val points = Seq(5L, 10L, 19L, 20L, 25L, 100L).toDF("p")
      val intervals = Seq((10L, 20L, "a"), (18L, 26L, "b"))
        .toDF("s", "e", "tag")
      val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e",
        binWidth = 7) // deliberately unaligned bins
        .select("p", "tag").as[(Long, String)].collect().toSet
      out shouldBe Set((10L, "a"), (19L, "a"), (19L, "b"), (20L, "b"), (25L, "b"))
    }
    it("agrees with the naive non-equi join on random data") {
      val rnd = new scala.util.Random(7)
      val points = (1 to 300).map(_ => rnd.nextInt(1000).toLong).toDF("p")
      val intervals = (1 to 40).map { _ =>
        val s = rnd.nextInt(950).toLong; (s, s + 1 + rnd.nextInt(80))
      }.toDF("s", "e")
      val binned = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 32)
        .as[(Long, Long, Long)].collect().sorted
      val naive = points.join(intervals,
          $"p" >= $"s" && $"p" < $"e")
        .as[(Long, Long, Long)].collect().sorted
      binned shouldBe naive
    }
  }
}

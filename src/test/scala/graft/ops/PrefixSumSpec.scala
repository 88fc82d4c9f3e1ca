package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The consolidated two-phase prefix scan (VERDICT r13 item 1):
  * bit-equality with the naive unpartitioned window on scrambled
  * data, the multi-value single-pass ride-along, the null-safe
  * stratum join, and rangeBucket's null/NaN/±Inf routing.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def naiveCum(rows: Seq[(Long, Long)], desc: Boolean)
      : Map[Long, Long] = {
    val sorted = if (desc) rows.sortBy(-_._1) else rows.sortBy(_._1)
    var acc = 0L
    sorted.map { case (s, v) =>
      val out = s -> acc; acc += v; out
    }.toMap // keys distinct by construction
  }

  describe("PrefixSum.cumBefore") {
    it("equals the naive global window, asc and desc, 1000 keys") {
      val rows = (0 until 1000)
        .map(i => ((i * 7919L) % 1000, (i % 5) + 1L))
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
        .toSeq
      for (desc <- Seq(false, true)) {
        val df = rows.toDF("s", "v")
        val bucketed = PrefixSum.rangeBucket(df, col("s"), 16, "__b")
        val sCol = if (desc) col("s").desc else col("s").asc
        val got = PrefixSum.cumBefore(bucketed, Seq.empty, "__b",
            bucketDesc = desc, Seq(sCol), Seq((col("v"), "cb")))
          .select("s", "cb").as[(Long, Long)].collect().toMap
        got shouldBe naiveCum(rows, desc)
      }
    }
    it("carries several prefix sums in one pass (rank + sum)") {
      val rows = Seq((10L, 4L), (20L, 3L), (5L, 2L), (40L, 1L))
      val df = rows.toDF("s", "v")
      val bucketed = PrefixSum.rangeBucket(df, col("s"), 4, "__b")
      val got = PrefixSum.cumBefore(bucketed, Seq.empty, "__b",
          bucketDesc = false, Seq(col("s").asc),
          Seq((lit(1L), "rn0"), (col("v"), "cum0")))
        .select("s", "rn0", "cum0").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      got(5L) shouldBe ((0L, 0L))
      got(10L) shouldBe ((1L, 2L))
      got(20L) shouldBe ((2L, 6L))
      got(40L) shouldBe ((3L, 9L))
    }
    it("keeps null strata via the null-safe offs join") {
      val df = Seq((Option("a"), 1L, 1L), (Option("a"), 2L, 1L),
        (Option.empty[String], 1L, 5L), (Option.empty[String], 3L, 7L))
        .toDF("g", "s", "v")
      val bucketed = PrefixSum.rangeBucket(df, col("s"), 4, "__b")
      val got = PrefixSum.cumBefore(bucketed, Seq("g"), "__b",
          bucketDesc = false, Seq(col("s").asc), Seq((col("v"), "cb")))
        .select("g", "s", "cb")
        .as[(Option[String], Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      got((None, 1L)) shouldBe 0L
      got((None, 3L)) shouldBe 5L // the null stratum scans on its own
      got((Some("a"), 2L)) shouldBe 1L
    }
  }

  describe("PrefixSum.rangeBucket") {
    it("routes null to -1, -Inf to 0, +Inf and NaN to the last " +
        "bucket, and keeps finite widths finite (ADVICE r13)") {
      val df = Seq(Option(1.0), Option(2.0), Option(100.0),
        Option(Double.NegativeInfinity), Option(Double.PositiveInfinity),
        Option(Double.NaN), Option.empty[Double]).toDF("s")
      val got = PrefixSum.rangeBucket(df, col("s"), 8, "__b")
        .select("s", "__b").collect()
        .map(r => (if (r.isNullAt(0)) "null"
          else r.getDouble(0).toString) -> r.getLong(1)).toMap
      got("null") shouldBe -1L
      got("-Infinity") shouldBe 0L
      got("Infinity") shouldBe 7L
      got("NaN") shouldBe 7L
      // finite scores spread: bounds exclude the infinities, so 1.0
      // and 100.0 land in DIFFERENT buckets (an infinite width would
      // have funneled every finite score into bucket 0)
      got("1.0") should be < got("100.0")
      got("1.0") should be >= 0L
    }
    it("is monotone in the score (bucket order = score order)") {
      val vals = (0 until 500).map(i => ((i * 37) % 500).toDouble)
      val df = vals.toDF("s")
      val got = PrefixSum.rangeBucket(df, col("s"), 16, "__b")
        .select("s", "__b").as[(Double, Long)].collect().sortBy(_._1)
      got.sliding(2).foreach { case Array((_, b1), (_, b2)) =>
        b1 should be <= b2
      }
    }
    it("collapses an all-equal domain into one bucket without error") {
      val df = Seq(5.0, 5.0, 5.0).toDF("s")
      PrefixSum.rangeBucket(df, col("s"), 8, "__b")
        .select("__b").distinct().count() shouldBe 1L
    }
  }
}

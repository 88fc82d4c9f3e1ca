package graft.ops

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class OhlcSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  describe("Ohlc.candles") {
    it("open/close follow (ms, id) order, high/low the values") {
      val rows = Seq(
        ("s", 0L, 30L, 3L, 7.0), ("s", 0L, 10L, 1L, 5.0),
        ("s", 0L, 20L, 2L, 9.0), ("s", 0L, 40L, 4L, 2.0))
      val r = Ohlc.candles(rows.toDF("series", "bucket", "ms", "id",
        "value")).collect().head
      r.getLong(2) shouldBe 4
      r.getDouble(3) shouldBe 5.0 // open: earliest ms
      r.getDouble(4) shouldBe 9.0
      r.getDouble(5) shouldBe 2.0
      r.getDouble(6) shouldBe 2.0 // close: latest ms
    }

    it("ms ties break on id") {
      val rows = Seq(("s", 0L, 10L, 2L, 1.0), ("s", 0L, 10L, 1L, 8.0))
      val r = Ohlc.candles(rows.toDF("series", "bucket", "ms", "id",
        "value")).collect().head
      r.getDouble(3) shouldBe 8.0 // id 1 opens
      r.getDouble(6) shouldBe 1.0 // id 2 closes
    }

    it("is order/partitioning independent") {
      val rows = (1 to 500).map(i =>
        ("s", (i % 5).toLong, (i * 37 % 1000).toLong, i.toLong,
          (i * 7 % 100).toDouble))
      val a = Ohlc.candles(rows.toDF("series", "bucket", "ms", "id",
        "value").repartition(3)).orderBy("bucket").collect().toSeq
      val b = Ohlc.candles(rows.reverse.toDF("series", "bucket", "ms",
        "id", "value").repartition(11)).orderBy("bucket").collect().toSeq
      a shouldBe b
    }
  }
}

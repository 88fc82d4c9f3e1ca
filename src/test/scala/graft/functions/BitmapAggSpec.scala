package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class BitmapAggSpec extends AnyFunSpec with Matchers with SparkSpec {

  describe("Bitmap64") {
    it("counts exactly across chunk boundaries, negatives, extremes") {
      val bm = new Bitmap64
      val vs = Seq(0L, 1L, 65535L, 65536L, -1L, -65536L,
        Long.MaxValue, Long.MinValue, 42L, 42L)
      vs.foreach(bm.add)
      bm.cardinality shouldBe vs.distinct.size
    }

    it("promotes array→bitmap containers and demotes on small unions") {
      val bm = new Bitmap64
      // > ArrayCap distinct lows in one chunk forces the bit-set form
      (0 until 5000).foreach(i => bm.add(i.toLong))
      bm.cardinality shouldBe 5000
      // canonical bytes: same set built in reverse must serialize equal
      val rev = new Bitmap64
      (4999 to 0 by -1).foreach(i => rev.add(i.toLong))
      bm.serialize().toSeq shouldBe rev.serialize().toSeq
    }

    it("or is set union and serialization is merge-order-canonical") {
      val a = new Bitmap64; val b = new Bitmap64
      (0 until 3000).foreach(i => a.add(i * 7L))
      (0 until 3000).foreach(i => b.add(i * 11L - 5000))
      val ab = Bitmap64.deserialize(a.serialize()); ab.or(b)
      val ba = Bitmap64.deserialize(b.serialize()); ba.or(a)
      ab.serialize().toSeq shouldBe ba.serialize().toSeq
      ab.cardinality shouldBe
        ((0 until 3000).map(_ * 7L) ++ (0 until 3000).map(_ * 11L - 5000))
          .distinct.size
    }

    it("roundtrips through bytes") {
      val bm = new Bitmap64
      (0 until 6000).foreach(i => bm.add(i * 3L))
      val back = Bitmap64.deserialize(bm.serialize())
      back.cardinality shouldBe bm.cardinality
      back.serialize().toSeq shouldBe bm.serialize().toSeq
    }
  }

  describe("BitmapAgg (Spark)") {
    it("bitmap_build + cardinality equals count_distinct per group") {
      import spark.implicits._
      val df = (1 to 20000)
        .map(i => (i % 7, (i * 2654435761L) % 3000))
        .toDF("g", "id")
        .repartition(8)
      val got = df.groupBy("g")
        .agg(BitmapAgg.bitmapCardinality(
          BitmapAgg.bitmapBuild(col("id"))).as("n"))
        .orderBy("g")
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      val want = df.groupBy("g")
        .agg(countDistinct("id").as("n"))
        .orderBy("g")
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      got shouldBe want
    }

    it("persisted states re-aggregate: merge of per-day states equals direct distinct") {
      import spark.implicits._
      val df = (1 to 5000)
        .map(i => (i % 5, i % 30, (i * 31L) % 700))
        .toDF("g", "day", "id")
        .repartition(8)
      val states = df.groupBy("g", "day")
        .agg(BitmapAgg.bitmapBuild(col("id")).as("bm"))
      val rolled = states.groupBy("g")
        .agg(BitmapAgg.bitmapCardinality(
          BitmapAgg.bitmapMerge(col("bm"))).as("n"))
        .orderBy("g")
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      val direct = df.groupBy("g")
        .agg(countDistinct("id").as("n"))
        .orderBy("g")
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      rolled shouldBe direct
    }

    it("all-null input yields null state, nulls are skipped") {
      import spark.implicits._
      val df = Seq((1, Some(10L)), (1, None), (2, None))
        .toDF("g", "id")
      val rows = df.groupBy("g")
        .agg(BitmapAgg.bitmapBuild(col("id")).as("bm"))
        .orderBy("g")
        .collect()
      rows(0).getAs[Array[Byte]]("bm") should not be null
      rows(1).getAs[Array[Byte]]("bm") shouldBe null
    }
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "target/scratch/zonemap_spec"

  private def fixture() = {
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    ZoneMap.write(df, dir, "k", 8)
    df
  }

  describe("ZoneMap.write") {
    it("manifest has one row per file and covers every row") {
      fixture()
      val m = spark.read.parquet(ZoneMap.manifestPath(dir))
        .as[(String, Long, Long, Long)].collect()
      m.length shouldBe 8
      m.map(_._4).sum shouldBe 1000L
      m.foreach { case (_, lo, hi, _) => lo should be <= hi }
      // range-sorted write → file intervals are disjoint
      val sorted = m.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => a._3 should be < b._2
        case _ =>
      }
    }
  }

  describe("ZoneMap.readRange") {
    it("prunes files and still matches the unpruned filter exactly") {
      val df = fixture()
      val cand = ZoneMap.candidateFiles(spark, dir, lit(300L), lit(400L))
      cand.size should be < 8
      cand.size should be >= 1
      val got = ZoneMap.readRange(spark, dir, "k", lit(300L), lit(400L))
        .as[(Long, String)].collect().sortBy(_._1)
      val want = df.filter($"k" >= 300L && $"k" < 400L)
        .as[(Long, String)].collect().sortBy(_._1)
      got shouldBe want
    }

    it("range boundaries are [from, until)") {
      fixture()
      val got = ZoneMap.readRange(spark, dir, "k", lit(1L), lit(2L))
        .as[(Long, String)].collect()
      got.map(_._1).toSeq shouldBe Seq(1L)
    }

    it("empty range returns zero rows with the original schema") {
      fixture()
      val got = ZoneMap.readRange(spark, dir, "k", lit(5000L), lit(6000L))
      got.columns.toSeq shouldBe Seq("k", "v")
      got.count() shouldBe 0L
    }

    it("files with an all-NULL key column are never pruned away") {
      val df = (1 to 100).map(i => (if (i <= 50) Some(i.toLong) else None,
        s"v$i")).toDF("k", "v")
      // 2 files: nulls sort first in repartitionByRange, so one file
      // is null-heavy; its manifest lo/hi may be null
      ZoneMap.write(df, dir + "_nulls", "k", 2)
      val got = ZoneMap.readRange(spark, dir + "_nulls", "k",
        lit(10L), lit(20L)).as[(Option[Long], String)].collect()
      got.map(_._1.get).sorted.toSeq shouldBe (10L until 20L).toSeq
    }
  }
}

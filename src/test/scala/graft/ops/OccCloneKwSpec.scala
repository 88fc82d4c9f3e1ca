package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OccCloneKwSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String = {
    val p = s"target/scratch/spec_$tag"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  describe("VersionedTable.commitIf") {
    it("applies on a fresh base and conflicts loudly on a stale one") {
      val p = fresh("occ")
      val df1 = Seq(1, 2).toDF("k")
      VersionedTable.commitIf(spark, p, df1, 10L, expectedVersion = -1L) shouldBe 0L
      VersionedTable.commitIf(spark, p, Seq(3).toDF("k"), 20L, 0L) shouldBe 1L
      val ex = intercept[java.util.ConcurrentModificationException] {
        VersionedTable.commitIf(spark, p, Seq(4).toDF("k"), 30L, 0L)
      }
      ex.getMessage should include ("version 1")
      // the failed attempt must not have advanced the log
      VersionedTable.versions(spark, p).map(_.version) shouldBe Seq(0L, 1L)
      // rebase succeeds
      VersionedTable.commitIf(spark, p, Seq(4).toDF("k"), 40L, 1L) shouldBe 2L
    }
  }

  describe("VersionedTable.shallowClone") {
    it("reads the source version without copying and evolves independently") {
      val src = fresh("clone_src"); val dst = fresh("clone_dst")
      VersionedTable.commit(spark, src, Seq(1, 2, 3).toDF("k"), 10L)
      VersionedTable.commit(spark, src, Seq(9).toDF("k"), 20L)
      VersionedTable.shallowClone(spark, src, dst, srcVersion = 0L, 30L)
      VersionedTable.readLatest(spark, dst).as[Int].collect().sorted shouldBe
        Array(1, 2, 3)
      // clone-local commit; source latest unaffected
      VersionedTable.commit(spark, dst, Seq(7, 8).toDF("k"), 40L)
      VersionedTable.readLatest(spark, dst).count() shouldBe 2L
      VersionedTable.readLatest(spark, src).as[Int].collect() shouldBe Array(9)
      // vacuum on the clone retires the cloned manifest but must NOT
      // delete the source's data dir
      VersionedTable.vacuum(spark, dst, retainLast = 1) shouldBe Seq(0L)
      VersionedTable.read(spark, src, 0L).count() shouldBe 3L
    }
    it("refuses to clone onto a non-empty table") {
      val src = fresh("clone_src2"); val dst = fresh("clone_dst2")
      VersionedTable.commit(spark, src, Seq(1).toDF("k"), 10L)
      VersionedTable.commit(spark, dst, Seq(2).toDF("k"), 20L)
      an[IllegalArgumentException] should be thrownBy
        VersionedTable.shallowClone(spark, src, dst, 0L, 30L)
    }
  }

  describe("RankTests.kruskalWallis") {
    it("matches the hand-computed H on a no-tie fixture") {
      // groups a:(1,2), b:(4,5), c:(8,9); N=6, ranks 1..6
      // rank sums: a {1,2}=3, b {3,4}=7, c {5,6}=11
      // H = 12/(6·7)·(9/2 + 49/2 + 121/2) − 3·7 = 25.5714… − 21
      //   = 4.571428…
      val df = Seq(("s", "a", 1.0), ("s", "a", 2.0), ("s", "b", 4.0),
        ("s", "b", 5.0), ("s", "c", 8.0), ("s", "c", 9.0))
        .toDF("g", "grp", "v")
      val r = graft.quality.RankTests.kruskalWallis(df, "g", "grp", "v")
        .collect().head
      r.getDouble(r.fieldIndex("h")) shouldBe (4.571428571 +- 1e-5)
      r.getLong(r.fieldIndex("n")) shouldBe 6L
    }
    it("all-tied strata report null H") {
      val df = Seq(("s", "a", 5.0), ("s", "b", 5.0), ("s", "c", 5.0))
        .toDF("g", "grp", "v")
      val r = graft.quality.RankTests.kruskalWallis(df, "g", "grp", "v")
        .collect().head
      r.isNullAt(r.fieldIndex("h")) shouldBe true
    }
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class TimeTravelSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  describe("Snapshot.asOf") {
    // history for one key: [10, 20) closed, [20, ∞) open
    def hist = Seq(
      (1L, "a", ts("2024-01-10 00:00:00"), Option(ts("2024-01-20 00:00:00"))),
      (1L, "b", ts("2024-01-20 00:00:00"), Option.empty[java.sql.Timestamp]),
      (2L, "x", ts("2024-01-25 00:00:00"), Option.empty[java.sql.Timestamp]))
      .toDF("k", "v", Snapshot.ValidFrom, Snapshot.ValidTo)

    it("returns the closed version whose interval contains the point") {
      Snapshot.asOf(hist, lit(ts("2024-01-15 00:00:00")))
        .select("k", "v").as[(Long, String)].collect().toSet shouldBe
        Set((1L, "a"))
    }

    it("valid_from is inclusive, valid_to exclusive (dbt interval semantics)") {
      Snapshot.asOf(hist, lit(ts("2024-01-20 00:00:00")))
        .select("k", "v").as[(Long, String)].collect().toSet shouldBe
        Set((1L, "b"))
    }

    it("keys born after the point are absent; open rows unbounded") {
      Snapshot.asOf(hist, lit(ts("2024-01-21 00:00:00")))
        .select("k", "v").as[(Long, String)].collect().toSet shouldBe
        Set((1L, "b"))
      Snapshot.asOf(hist, lit(ts("2025-01-01 00:00:00")))
        .count() shouldBe 2
    }

    it("is a pure scan predicate — no exchange in the plan") {
      val plan = Snapshot.asOf(hist, lit(ts("2024-01-15 00:00:00")))
        .queryExecution.executedPlan.toString
      "Exchange".r.findAllIn(plan).size shouldBe 0
    }
  }

  describe("VersionedTable") {
    def freshPath(tag: String): String = {
      val p = s"target/scratch/tt_spec_$tag"
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
      p
    }

    it("commits are sequential and reads resolve by version and by time") {
      val p = freshPath("basic")
      VersionedTable.commit(spark, p, Seq(1).toDF("n"), 100L) shouldBe 0L
      VersionedTable.commit(spark, p, Seq(1, 2).toDF("n"), 200L) shouldBe 1L
      VersionedTable.commit(spark, p, Seq(1, 2, 3).toDF("n"), 300L) shouldBe 2L

      VersionedTable.read(spark, p, 0L).count() shouldBe 1
      VersionedTable.read(spark, p, 1L).count() shouldBe 2
      VersionedTable.readLatest(spark, p).count() shouldBe 3
      // between commits → the version a reader then would have seen
      VersionedTable.readAsOf(spark, p, 250L).count() shouldBe 2
      // exactly at a commit → that commit
      VersionedTable.readAsOf(spark, p, 200L).count() shouldBe 2
      VersionedTable.readAsOf(spark, p, 99999L).count() shouldBe 3
    }

    it("old versions stay readable after later commits (time travel)") {
      val p = freshPath("travel")
      VersionedTable.commit(spark, p, Seq("old").toDF("s"), 10L)
      VersionedTable.commit(spark, p, Seq("new").toDF("s"), 20L)
      VersionedTable.read(spark, p, 0L).as[String].head() shouldBe "old"
    }

    it("rejects reads before the first commit and unknown versions") {
      val p = freshPath("missing")
      VersionedTable.commit(spark, p, Seq(1).toDF("n"), 100L)
      a[NoSuchElementException] should be thrownBy
        VersionedTable.readAsOf(spark, p, 50L)
      a[NoSuchElementException] should be thrownBy
        VersionedTable.read(spark, p, 7L)
    }

    it("rejects non-monotone commit timestamps (ambiguous AS OF)") {
      val p = freshPath("monotone")
      VersionedTable.commit(spark, p, Seq(1).toDF("n"), 100L)
      an[IllegalArgumentException] should be thrownBy
        VersionedTable.commit(spark, p, Seq(2).toDF("n"), 99L)
    }

    it("ignores orphan data dirs from crashed commits (no manifest)") {
      val p = freshPath("orphan")
      VersionedTable.commit(spark, p, Seq(1).toDF("n"), 100L)
      // a crashed commit: data landed, manifest never renamed in
      Seq(9, 9).toDF("n").write.parquet(s"$p/v=1")
      VersionedTable.versions(spark, p).map(_.version) shouldBe Seq(0L)
      VersionedTable.readLatest(spark, p).count() shouldBe 1
      // next successful commit reuses the number and overwrites debris
      VersionedTable.commit(spark, p, Seq(5, 6).toDF("n"), 200L) shouldBe 1L
      VersionedTable.read(spark, p, 1L).as[Int].collect().sorted shouldBe
        Array(5, 6)
    }

    it("vacuum never sweeps an orphan above the latest version (in-flight commit)") {
      val p = freshPath("inflight")
      VersionedTable.commit(spark, p, Seq(1).toDF("n"), 100L)
      VersionedTable.commit(spark, p, Seq(2).toDF("n"), 200L)
      // an in-flight commit: data for v=2 landed, manifest not yet renamed
      Seq(3).toDF("n").write.parquet(s"$p/v=2")
      VersionedTable.vacuum(spark, p, retainLast = 1)
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the in-flight dir survived; the commit can still finish safely
      fs.exists(new org.apache.hadoop.fs.Path(s"$p/v=2")) shouldBe true
      fs.exists(new org.apache.hadoop.fs.Path(s"$p/v=0")) shouldBe false
    }

    it("vacuum drops all but the retained tail plus orphan dirs") {
      val p = freshPath("vacuum")
      VersionedTable.commit(spark, p, Seq(1).toDF("n"), 100L)
      VersionedTable.commit(spark, p, Seq(2).toDF("n"), 200L)
      VersionedTable.commit(spark, p, Seq(3).toDF("n"), 300L)
      Seq(9).toDF("n").write.parquet(s"$p/v=orphan")
      VersionedTable.vacuum(spark, p, retainLast = 2) shouldBe Seq(0L)
      VersionedTable.versions(spark, p).map(_.version) shouldBe Seq(1L, 2L)
      a[NoSuchElementException] should be thrownBy
        VersionedTable.read(spark, p, 0L)
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(new org.apache.hadoop.fs.Path(s"$p/v=0")) shouldBe false
      fs.exists(new org.apache.hadoop.fs.Path(s"$p/v=orphan")) shouldBe false
      // retained versions still read
      VersionedTable.read(spark, p, 1L).as[Int].head() shouldBe 2
    }
  }
}

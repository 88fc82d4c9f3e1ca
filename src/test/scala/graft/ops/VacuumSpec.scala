package graft.ops

import org.apache.hadoop.fs.Path

import graft.SparkSpec

class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  it("deletes only expired debris, never live tables or fresh staging") {
    val base = "target/scratch/vacuum_spec"
    val fs = fsOf(base)
    fs.delete(new Path(base), true)
    val df = Seq(1, 2, 3).toDF("x")
    df.write.parquet(s"$base/live_table")
    df.write.parquet(s"$base/t") // live sibling of the swap debris
    df.write.parquet(s"$base/t.staging")
    df.write.parquet(s"$base/t.old")
    df.write.parquet(s"$base/t__compact_tmp")
    df.write.parquet(s"$base/fresh") // live sibling, fresh swap in flight
    df.write.parquet(s"$base/fresh.staging")
    val now = 1000000000000L
    Seq("t.staging", "t.old", "t__compact_tmp").foreach(d =>
      fs.setTimes(new Path(s"$base/$d"), now - 7200 * 1000L, -1))
    fs.setTimes(new Path(s"$base/fresh.staging"), now - 60 * 1000L, -1)
    fs.setTimes(new Path(s"$base/live_table"), now - 7200 * 1000L, -1)

    val st = Vacuum.vacuum(spark, base, retentionMs = 3600 * 1000L, now = now)
    st.nExamined shouldBe 7
    st.nCandidates shouldBe 4
    st.nDeleted shouldBe 3
    st.bytesReclaimed should be > 0L
    fs.exists(new Path(s"$base/live_table")) shouldBe true
    fs.exists(new Path(s"$base/fresh.staging")) shouldBe true
    fs.exists(new Path(s"$base/t.staging")) shouldBe false
    fs.exists(new Path(s"$base/t.old")) shouldBe false
    fs.exists(new Path(s"$base/t__compact_tmp")) shouldBe false
    // the live table still reads
    spark.read.parquet(s"$base/live_table").count() shouldBe 3L
  }

  it("DebrisNameRe is the complete reserved-name contract: every " +
      "sweepable form matches it, live names do not (ADVICE r11)") {
    val sweepable = Seq("t.staging", "t.old", "t__compact_tmp",
      "t.staging-deadbeef", "t.old-0123abcd")
    sweepable.foreach { n =>
      withClue(n) { Vacuum.DebrisNameRe.matches(n) shouldBe true }
    }
    Seq("t", "t.stagingx", "t.old-xyz", "t.old-deadbee", "staging",
      "t.parquet").foreach { n =>
      withClue(n) { Vacuum.DebrisNameRe.matches(n) shouldBe false }
    }
    // the untagged stems stay listed in DebrisSuffixes
    Vacuum.DebrisSuffixes.foreach(s =>
      Vacuum.DebrisNameRe.matches("t" + s) shouldBe true)
    // and the sweep actually deletes a tagged form (retention 0)
    val base = "target/scratch/vacuum_spec_re"
    val fs = fsOf(base)
    fs.delete(new Path(base), true)
    Seq(1).toDF("x").write.parquet(s"$base/t")
    Seq(1).toDF("x").write.parquet(s"$base/t.old-0123abcd")
    val now = 1000000000000L
    fs.setTimes(new Path(s"$base/t.old-0123abcd"), now - 1L, -1)
    Vacuum.vacuum(spark, base, 0L, now).nDeleted shouldBe 1
    fs.exists(new Path(s"$base/t.old-0123abcd")) shouldBe false
    fs.exists(new Path(s"$base/t")) shouldBe true
  }

  it("a baseless `__compact_tmp` entry is NOT a candidate — the " +
      "sweep dispatches on DebrisNameRe itself (ADVICE r12)") {
    val base = "target/scratch/vacuum_spec_baseless"
    val fs = fsOf(base)
    fs.delete(new Path(base), true)
    // the name IS the reserved suffix with no base: DebrisNameRe
    // requires `.+` before it, so this must never be swept
    Seq(1).toDF("x").write.parquet(s"$base/__compact_tmp")
    val now = 1000000000000L
    fs.setTimes(new Path(s"$base/__compact_tmp"), now - 7200 * 1000L, -1)
    Vacuum.DebrisNameRe.matches("__compact_tmp") shouldBe false
    val st = Vacuum.vacuum(spark, base, 0L, now)
    st.nCandidates shouldBe 0
    fs.exists(new Path(s"$base/__compact_tmp")) shouldBe true
  }

  it("retention 0 sweeps all debris; an empty root is a no-op") {
    val base = "target/scratch/vacuum_spec2"
    val fs = fsOf(base)
    fs.delete(new Path(base), true)
    Seq(1).toDF("x").write.parquet(s"$base/a")
    Seq(1).toDF("x").write.parquet(s"$base/a.old")
    val now = 1000000000000L
    fs.setTimes(new Path(s"$base/a.old"), now - 1L, -1)
    Vacuum.vacuum(spark, base, 0L, now).nDeleted shouldBe 1
    fs.delete(new Path(s"$base/a"), true)
    Vacuum.vacuum(spark, base, 0L, now) shouldBe Vacuum.Stats(0, 0, 0, 0L)
  }

  it("never sweeps a swap-suffix dir with no live sibling") {
    val base = "target/scratch/vacuum_spec3"
    val fs = fsOf(base)
    fs.delete(new Path(base), true)
    // a user table that merely happens to be named *.old
    Seq(1).toDF("x").write.parquet(s"$base/backup.old")
    val now = 1000000000000L
    fs.setTimes(new Path(s"$base/backup.old"), now - 7200 * 1000L, -1)
    val st = Vacuum.vacuum(spark, base, 0L, now)
    st.nCandidates shouldBe 0
    fs.exists(new Path(s"$base/backup.old")) shouldBe true
  }

  it("sweepOrphans reclaims sibling-less swap debris, still gated by retention") {
    val base = "target/scratch/vacuum_spec4"
    val fs = fsOf(base)
    fs.delete(new Path(base), true)
    // orphaned swap debris: its live table was dropped after the swap
    Seq(1).toDF("x").write.parquet(s"$base/dropped.old")
    Seq(1).toDF("x").write.parquet(s"$base/recent.staging")
    val now = 1000000000000L
    val week = 7 * 86400 * 1000L
    fs.setTimes(new Path(s"$base/dropped.old"), now - 2 * week, -1)
    fs.setTimes(new Path(s"$base/recent.staging"), now - 3600 * 1000L, -1)
    val st = Vacuum.vacuum(spark, base, retentionMs = week, now = now,
      sweepOrphans = true)
    st.nCandidates shouldBe 2 // both eligible, only the aged one expires
    st.nDeleted shouldBe 1
    fs.exists(new Path(s"$base/dropped.old")) shouldBe false
    fs.exists(new Path(s"$base/recent.staging")) shouldBe true
  }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CoecCheckpointSpec extends SparkSpec {
  import spark.implicits._

  describe("Coec.score") {
    it("outranks a low-position clicker over a high-position one") {
      // position 1 prior = 0.5, position 9 prior = 0.5 here; make
      // priors differ: pos 1 gets clicked half the time globally,
      // pos 9 never except by item b
      val log = Seq(
        ("a", 1L, 1L), ("a", 1L, 0L), ("x", 1L, 1L), ("x", 1L, 0L),
        ("b", 9L, 1L), ("y", 9L, 0L), ("z", 9L, 0L), ("w", 9L, 0L))
        .toDF("item", "pos", "click")
      val out = Coec.score(log, "item", "pos", "click").collect()
        .map(r => r.getAs[String]("item") -> r.getAs[Double]("coec"))
        .toMap
      // a: 1 click / (2 × 0.5) = 1.0 — exactly as expected
      out("a") shouldBe 1.0 +- 1e-6
      // b: 1 click / 0.25 expected = 4.0 — beats its position
      out("b") shouldBe 4.0 +- 1e-6
    }
    it("nulls items whose positions never click globally") {
      val log = Seq(("a", 1L, 0L), ("b", 1L, 0L)).toDF("item", "pos", "click")
      val r = Coec.score(log, "item", "pos", "click").collect().head
      r.isNullAt(r.fieldIndex("coec")) shouldBe true
    }
  }

  describe("quality.Wasserstein.distance") {
    import graft.quality.Wasserstein
    it("is zero for identical distributions and shift-proportional") {
      val same = (1 to 50).flatMap(i =>
        Seq(("g", i.toDouble % 10, false), ("g", i.toDouble % 10, true)))
      Wasserstein.distance(same.toDF("g", "v", "b"), "g", "v",
        col("b"), 0d, 1d, 20).collect().head
        .getAs[Double]("w1") shouldBe 0.0
      // batch b = batch a shifted by exactly 3 bins → W1 = 3·width
      val shifted = (1 to 50).flatMap(i =>
        Seq(("g", (i % 5).toDouble, false), ("g", (i % 5) + 3.0, true)))
      Wasserstein.distance(shifted.toDF("g", "v", "b"), "g", "v",
        col("b"), 0d, 1d, 20).collect().head
        .getAs[Double]("w1") shouldBe 3.0 +- 1e-6
    }
    it("counts empty-bin plateaus in the CDF gap") {
      // one point at 0 vs one at 10: gap spans 10 empty bins
      val df = Seq(("g", 0.0, false), ("g", 10.0, true))
        .toDF("g", "v", "b")
      Wasserstein.distance(df, "g", "v", col("b"), 0d, 1d, 20)
        .collect().head.getAs[Double]("w1") shouldBe 10.0 +- 1e-6
    }
  }

  describe("text.NegSampling.table") {
    import graft.text.NegSampling
    it("weights follow f^0.75 and shares sum to ≤ 1 over the top-k") {
      val docs = Seq("a a a a a a a a a a a a a a a a b", "b c")
        .toDF("text")
      val out = NegSampling.table(docs, "text", 3).collect()
        .map(r => r.getAs[String]("token") ->
          (r.getAs[Long]("f"), r.getAs[Double]("weight"))).toMap
      out("a")._1 shouldBe 16L
      out("a")._2 shouldBe 8.0 // 16^0.75
      out("b")._1 shouldBe 2L
      // tail boost: b has 8× fewer occurrences than a but only
      // 16^.75/2^.75 ≈ 4.76× less weight
      (out("a")._2 / out("b")._2) should be < 5.0
    }
  }

  describe("VersionedTable.checkpoint") {
    it("checkpointed replay equals full replay with fewer objects") {
      val path = "target/scratch/ckpt_spec"
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      val df = Seq((1L, "x")).toDF("id", "v")
      (0 until 4).foreach(i =>
        VersionedTable.commit(spark, path, df, 1000L + i))
      VersionedTable.checkpoint(spark, path) shouldBe 3L
      (4 until 6).foreach(i =>
        VersionedTable.commit(spark, path, df, 1000L + i))
      val (fast, opened) = VersionedTable.versionsCheckpointed(spark, path)
      fast shouldBe VersionedTable.versions(spark, path)
      fast.map(_.version) shouldBe (0L to 5L)
      opened shouldBe 4L // pointer + checkpoint + 2 tail manifests
      // a second checkpoint covers everything: zero tail
      VersionedTable.checkpoint(spark, path) shouldBe 5L
      VersionedTable.versionsCheckpointed(spark, path)._2 shouldBe 2L
    }
    it("vacuum rewrites a checkpoint to its surviving covered prefix") {
      val path = "target/scratch/ckpt_spec_vac_rw"
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      val df = Seq((1L, "x")).toDF("id", "v")
      (0 until 4).foreach(i =>
        VersionedTable.commit(spark, path, df, 1000L + i))
      VersionedTable.checkpoint(spark, path) shouldBe 3L
      VersionedTable.vacuum(spark, path, retainLast = 3) shouldBe Seq(0L)
      // both readers agree and every listed version is readable
      val (fast, _) = VersionedTable.versionsCheckpointed(spark, path)
      fast shouldBe VersionedTable.versions(spark, path)
      fast.map(_.version) shouldBe (1L to 3L)
      fast.foreach(c =>
        VersionedTable.read(spark, path, c.version).count() shouldBe 1L)
    }
    it("vacuum drops a fully-retired checkpoint (readers replay)") {
      val path = "target/scratch/ckpt_spec_vac_drop"
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      val df = Seq((1L, "x")).toDF("id", "v")
      (0 until 3).foreach(i =>
        VersionedTable.commit(spark, path, df, 1000L + i))
      VersionedTable.checkpoint(spark, path) shouldBe 2L
      (3 until 5).foreach(i =>
        VersionedTable.commit(spark, path, df, 1000L + i))
      VersionedTable.vacuum(spark, path, retainLast = 2) shouldBe
        Seq(0L, 1L, 2L)
      val (fast, opened) = VersionedTable.versionsCheckpointed(spark, path)
      fast shouldBe VersionedTable.versions(spark, path)
      fast.map(_.version) shouldBe (3L to 4L)
      opened shouldBe 2L // plain replay: pointer+checkpoint are gone
      fast.foreach(c =>
        VersionedTable.read(spark, path, c.version).count() shouldBe 1L)
    }
    it("treats a torn/unparseable pointer as absent (full replay)") {
      val path = "target/scratch/ckpt_spec_torn"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      (0 until 2).foreach(i =>
        VersionedTable.commit(spark, path,
          Seq((1L, "x")).toDF("id", "v"), 1000L + i))
      // simulate a torn write: empty pointer bytes
      val ptr = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(path, "_log"), "_last_checkpoint")
      fs.create(ptr, true).close()
      val (cs, opened) = VersionedTable.versionsCheckpointed(spark, path)
      cs.map(_.version) shouldBe (0L to 1L)
      opened shouldBe 2L
    }
    it("degrades to a full replay when no checkpoint exists") {
      val path = "target/scratch/ckpt_spec_none"
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      VersionedTable.commit(spark, path,
        Seq((1L, "x")).toDF("id", "v"), 1000L)
      val (cs, opened) = VersionedTable.versionsCheckpointed(spark, path)
      cs.map(_.version) shouldBe Seq(0L)
      opened shouldBe 1L
    }
  }
}

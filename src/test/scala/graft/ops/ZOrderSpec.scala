package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order layout: interleave correctness, deterministic bucketing,
  * and the property that matters — a box predicate prunes far more
  * files under z-order than under a hash layout.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }.sum

  describe("ZOrder.z2") {
    it("matches the reference Morton interleave on known values") {
      val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
        (255L, 0L), (0L, 255L), (170L, 85L), (255L, 255L))
      val rows = cases.toDF("x", "y")
        .withColumn("zv", ZOrder.z2(col("x"), col("y"), 8))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      rows.foreach { case (x, y, zv) =>
        zv shouldBe mortonRef(x, y, 8)
      }
    }

    it("is monotone in the prefix: nearby (x,y) share high bits") {
      // the 4-bit prefix of a 16-bit z-value identifies a 4x4 grid
      // cell of the 256x256 bucket space: points in the same
      // 64x64-bucket quadrant share it
      val z1 = mortonRef(10, 20, 8) >> 12
      val z2 = mortonRef(12, 22, 8) >> 12
      z1 shouldBe z2
    }
  }

  describe("ZOrder.bucket") {
    it("spans [0, buckets) inclusive of both bounds") {
      val df = Seq(0.0, 50.0, 99.9, 100.0).toDF("v")
        .select(ZOrder.bucket(col("v"), 0.0, 100.0, 256).as("b"))
      val bs = df.collect().map(_.getLong(0))
      bs.head shouldBe 0L
      bs.last shouldBe 255L // v = hi stays inside the last bucket
      all(bs) should (be >= 0L and be < 256L)
    }
  }

  describe("skipping behaviour") {
    it("a box predicate prunes most z-ordered files but few hash-placed ones") {
      val rnd = new scala.util.Random(11)
      val pts = (1 to 4000).map(i =>
        (i.toLong, rnd.nextDouble() * 1000, rnd.nextDouble() * 1000))
      val df = pts.toDF("id", "x", "y")
      val laid = ZOrder.assign(df, "x", "y", 0.0, 1000.0, 0.0, 1000.0,
        bits = 8, partitionBits = 4)
      // box = central 20% on both dims
      val z = ZOrder.skippingStats(laid, "x", "y", 400, 600, 400, 600)
        .collect()
      val zScan = z.count(_.getBoolean(6))
      z.length shouldBe 16
      // hash layout: same stats but files keyed by hash(id) % 16
      val hashed = df.withColumn("pid", pmod(hash(col("id")), lit(16)))
      val h = ZOrder.skippingStats(hashed, "x", "y", 400, 600, 400, 600)
        .collect()
      val hScan = h.count(_.getBoolean(6))
      // every hash file spans the whole space -> nothing prunes;
      // z-order confines the box to a few quadrant files
      hScan shouldBe 16
      zScan should be <= 4
    }
  }

  describe("assignSorted (1-D total-order layout)") {
    it("written files carry disjoint increasing ranges and are sorted inside") {
      import org.apache.hadoop.fs.Path
      val rnd = new scala.util.Random(7)
      val df = (1 to 2000).map(i => (i.toLong, rnd.nextDouble() * 500))
        .toDF("id", "v")
      val base = "target/scratch/sorted_layout_spec"
      val fs = new Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      // (pid, v) sort: satisfies the dynamic-partition write's sort
      // requirement, so Spark doesn't insert its own pid-only
      // (unstable) sort over it
      ZOrder.assignSorted(df, "v", 0.0, 500.0, 8)
        .repartition(col("pid")).sortWithinPartitions("pid", "v")
        .write.partitionBy("pid").parquet(base)
      // disjoint increasing ranges across pid order
      val stats = spark.read.parquet(base)
        .groupBy(col("pid").cast("long").as("pid"))
        .agg(min("v").as("mn"), max("v").as("mx"))
        .orderBy("pid").as[(Long, Double, Double)].collect()
      stats.sliding(2).foreach {
        case Array(a, b) => a._3 should be < b._2
        case _ =>
      }
      // inside one physical file the rows are value-sorted (single
      // small file -> single input split -> collect preserves order)
      val pid0 = fs.listStatus(new Path(s"$base/pid=0"))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      pid0 should not be empty
      val rows = spark.read.parquet(pid0.head.getPath.toString)
        .select("v").as[Double].collect()
      rows shouldBe rows.sorted
    }
  }
}

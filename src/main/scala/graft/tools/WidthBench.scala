package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main reproducing BASELINE.md's covariance-path width
  * comparison (the evidence behind `PcaPower.ExactWidthCutoff`): the
  * q329 d=256 widening of the embeddings table, timed min-of-3
  * through BOTH covariance paths. Not part of any gated artifact —
  * run it when revisiting the switch point:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch "runMain graft.tools.WidthBench"
  */
object WidthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wide = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(flatten(array(
        col("embedding"),
        transform(col("embedding"),
          x => (x * lit(0.5d) + lit(0.01d)).cast("float")),
        transform(col("embedding"),
          x => (x * x * lit(0.25d)).cast("float")),
        transform(col("embedding"),
          x => (-x + lit(0.125d)).cast("float")))).as("embedding"))
    println(s"[widthbench] rows=${wide.count()} sf=$sfDir")
    for ((tag, exact) <- Seq(("moments_d256", false), ("exact_d256", true))) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.ann.PcaPower.topComponent(spark, wide, "embedding",
          iters = 5, exact = Some(exact)).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[widthbench] $tag min=${ts.min}%.2fs " +
        s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

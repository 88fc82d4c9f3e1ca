package graft.tools
import org.apache.spark.sql.SparkSession
object W64 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = graft.sources.Tables.load(spark, sfDir, "embeddings")
    for ((tag, exact) <- Seq(("exact_d64", true), ("moments_d64", false), ("exact_d64b", true), ("moments_d64b", false))) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.ann.PcaPower.topComponent(spark, vecs, "embedding",
          iters = 5, exact = Some(exact)).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[w64] $tag min=${ts.min}%.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // equality check
    val a = graft.ann.PcaPower.topComponent(spark, vecs, "embedding", iters = 5, exact = Some(true))
    val b = graft.ann.PcaPower.topComponent(spark, vecs, "embedding", iters = 5, exact = Some(false))
    println("[w64] diff=" + (a.exceptAll(b).count() + b.exceptAll(a).count()))
    spark.stop()
  }
}

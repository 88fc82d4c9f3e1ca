package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: component timing for the q77 PQ pipeline. */
object DevPqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ann.{Ann, Pq}
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    vecs.count()
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val books = Pq.trainCodebooks(vecs, "vec_id", "embedding",
        dim = 64, m = 16, k = 64, iters = 3)
      println(f"[pq] rep$rep train ${(System.nanoTime() - t0) / 1e9}%.2fs")
      val queries = vecs.filter(col("vec_id") < 10)
      t0 = System.nanoTime()
      Pq.pqTopK(vecs, queries, "vec_id", "embedding",
        dim = 64, k = 5, books, rerankDepth = 50).count()
      println(f"[pq] rep$rep pqTopK ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
      Ann.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 5).count()
      println(f"[pq] rep$rep brute ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}

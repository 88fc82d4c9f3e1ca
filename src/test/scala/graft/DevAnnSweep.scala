package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: |Q| scaling sweep for the ANN strategies — quantifies
  * the brute/PQ (broadcast full-scan, cost ∝ |Q|·N) vs IVF/LSH
  * (bucket-pruned, cost ∝ |Q|·N·nProbe/nLists) crossover that the
  * SURVEY §4 retrieval story cites.
  * sbt "Test/runMain graft.DevAnnSweep /root/testdata/sf0.1"
  */
object DevAnnSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ann.{Ann, Pq}
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = vecs.count()
    val cents = Ann.trainCentroids(vecs, "vec_id", "embedding", nLists = 8, iters = 3)
    val books = Pq.trainCodebooks(vecs, "vec_id", "embedding",
      dim = 64, m = 16, k = 64, iters = 2)
    def time(f: => Long): Double = {
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      reps.min
    }
    println(s"[sweep] corpus n=$n dim=64 (k=5 per query; sec = min of 2)")
    println("[sweep] |Q|,brute,lsh,ivf_nprobe2,pq_depth50")
    for (q <- Seq(10, 50, 200, 1000)) {
      val queries = vecs.filter(col("vec_id") < q)
      val brute = time(Ann.bruteForceTopK(vecs, queries, "vec_id", "embedding", 5).count())
      val lsh = time(Ann.lshTopK(vecs, queries, "vec_id", "embedding", 5,
        bits = 16, bands = 4).count())
      val ivf = time(Ann.ivfTopK(vecs, queries, "vec_id", "embedding", 5,
        cents, nProbe = 2).count())
      val pq = time(Pq.pqTopK(vecs, queries, "vec_id", "embedding", 64, 5,
        books, rerankDepth = 50).count())
      println(f"[sweep] $q,$brute%.2f,$lsh%.2f,$ivf%.2f,$pq%.2f")
    }
    spark.stop()
  }
}

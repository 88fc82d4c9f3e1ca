package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch probe (not part of the library surface). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val vecs = sources.Tables.load(spark, dir, "embeddings")
    val qs = vecs.filter(col("vec_id") < 10)
    val exact = ann.Ann.bruteForceTopK(vecs, qs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((bits, bands) <- Seq((8, 8), (16, 8), (12, 12))) {
      val got = ann.Ann.lshTopK(vecs, qs, "vec_id", "embedding", k = 5,
          bits = bits, bands = bands)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"LSH bits=$bits bands=$bands: hit=${(exact & got).size}/${exact.size}" +
        s" extra=${(got -- exact).size}")
    }
    val exactByQ = exact.groupBy(_._1)
    val cents = ann.Ann.trainCentroids(vecs, "vec_id", "embedding", nLists = 8, iters = 3)
    for (nProbe <- Seq(2, 4, 6, 7)) {
      val got = ann.Ann.ivfTopK(vecs, qs, "vec_id", "embedding", k = 5, cents, nProbe = nProbe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val perQ = exactByQ.map { case (q, es) => (es & got.groupBy(_._1).getOrElse(q, Set())).size }
      println(s"IVF nProbe=$nProbe: hit=${(exact & got).size}/${exact.size} minPerQ=${perQ.min}")
    }
    spark.stop()
  }
}

package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.StreamSink

class AnnIvfSpec extends SparkSpec {

  describe("IVF ANN") {
    import spark.implicits._
    // two well-separated clusters in dim 4
    lazy val vecs = ((0L to 9L).map(i =>
      (i, Array(10f + i * 0.1f, 0f, 0f, 1f))) ++
      (10L to 19L).map(i =>
        (i, Array(0f, 10f + i * 0.1f, 0f, 1f))))
      .toDF("vec_id", "embedding")

    it("trains deterministic centroids that separate the clusters") {
      val cents = Ann.trainCentroids(vecs, "vec_id", "embedding",
        nLists = 2, iters = 4)
      cents.length shouldBe 2
      val again = Ann.trainCentroids(vecs, "vec_id", "embedding",
        nLists = 2, iters = 4)
      cents shouldBe again
      // one centroid dominated by dim 0, the other by dim 1
      cents.map(c => c.indexOf(c.max)).toSet shouldBe Set(0, 1)
    }

    it("matches brute force when probing all lists") {
      val cents = Ann.trainCentroids(vecs, "vec_id", "embedding",
        nLists = 2, iters = 4)
      val queries = vecs.filter(col("vec_id").isin(0L, 15L))
      val ivf = Ann.ivfTopK(vecs, queries, "vec_id", "embedding",
        k = 3, cents, nProbe = 2)
        .select("query_id", "neighbor_id", "rk")
        .as[(Long, Long, Int)].collect().toSet
      val brute = Ann.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 3)
        .select("query_id", "neighbor_id", "rk")
        .as[(Long, Long, Int)].collect().toSet
      ivf shouldBe brute
    }

    it("with nProbe=1 only scores the query's own cluster") {
      val cents = Ann.trainCentroids(vecs, "vec_id", "embedding",
        nLists = 2, iters = 4)
      val out = Ann.ivfTopK(vecs, vecs.filter(col("vec_id") === 0L),
        "vec_id", "embedding", k = 20, cents, nProbe = 1)
        .select("neighbor_id").as[Long].collect()
      out.toSet shouldBe (1L to 9L).toSet // cluster mates only
    }
  }

  describe("StreamSink.writeWithDisposition") {
    it("merges micro-batches idempotently on the primary key") {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

      val path = "target/scratch/streamsink-table"
      val ckpt = "target/scratch/streamsink-ckpt"
      for (p <- Seq(path, ckpt)) {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      }

      val input = MemoryStream[(Long, String)]
      val q = StreamSink.writeWithDisposition(
        input.toDF().toDF("id", "v"), path, ckpt, "merge", Seq("id"))
      try {
        input.addData((1L, "a"), (2L, "b"))
        q.processAllAvailable()
        input.addData((2L, "B"), (3L, "c"))
        q.processAllAvailable()
        val out = spark.read.parquet(path).as[(Long, String)].collect().sorted
        out shouldBe Array((1L, "a"), (2L, "B"), (3L, "c"))
      } finally q.stop()
    }
  }
}

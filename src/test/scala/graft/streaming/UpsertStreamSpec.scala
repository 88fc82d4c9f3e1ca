package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class UpsertStreamSpec extends SparkSpec {
  import Streams._

  describe("upsertStream") {
    it("maintains the latest row per key across batches, counting all") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[UpsertIn]
      val q = upsertStream(input.toDS().toDF())
        .writeStream.format("memory").queryName("ups_out")
        .outputMode("update").start()
      try {
        input.addData(UpsertIn(1L, 100L, 1L, "a"),
          UpsertIn(1L, 200L, 2L, "b"), UpsertIn(2L, 50L, 3L, "x"))
        q.processAllAvailable()
        val batch1 = spark.table("ups_out").as[UpsertOut].collect()
          .map(u => u.user_id -> u).toMap
        batch1(1L).last_type shouldBe "b"
        batch1(1L).n_events shouldBe 2L
        batch1(2L).last_type shouldBe "x"

        // batch 2: a LATE event for user 1 (older than current
        // winner) must bump the count but keep the winner; a newer
        // event for user 2 replaces it
        input.addData(UpsertIn(1L, 150L, 4L, "late"),
          UpsertIn(2L, 60L, 5L, "y"))
        q.processAllAvailable()
        val rows = spark.table("ups_out").as[UpsertOut].collect()
        val latest1 = rows.filter(_.user_id == 1L)
          .maxBy(_.n_events)
        latest1.last_type shouldBe "b" // late row never wins
        latest1.n_events shouldBe 3L // but it counts
        val latest2 = rows.filter(_.user_id == 2L).maxBy(_.n_events)
        latest2.last_type shouldBe "y"
        latest2.last_event_id shouldBe 5L
      } finally q.stop()
    }
    it("breaks exact-ts ties by event id (the batch total order)") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[UpsertIn]
      val q = upsertStream(input.toDS().toDF())
        .writeStream.format("memory").queryName("ups_tie")
        .outputMode("update").start()
      try {
        input.addData(UpsertIn(1L, 100L, 9L, "hi"),
          UpsertIn(1L, 100L, 3L, "lo"))
        q.processAllAvailable()
        val out = spark.table("ups_tie").as[UpsertOut].collect().head
        out.last_event_id shouldBe 9L
        out.last_type shouldBe "hi"
      } finally q.stop()
    }
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Sessionize

class StreamsSpec extends SparkSpec {
  import Streams._

  private val GapNs = 1800L * 1000000000L // 30 min
  // base offset keeps the first event strictly above the initial
  // watermark (epoch 0) — an event AT the watermark is dropped as late
  private def ns(minutes: Long): Long = (86400L + minutes * 60L) * 1000000000L

  describe("sessionizeStream") {
    it("closes a session by gap within the stream and flushes the last session by event-time timeout") {
      implicit val s = spark
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext

      val input = MemoryStream[Event]
      val events = input.toDS()
        .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
        .withWatermark("event_time", "1 second")
        .as[Event]
      val out = sessionizeStream(events, GapNs)
      val q = out.writeStream.format("memory")
        .queryName("sess_out").outputMode("append").start()
      try {
        // user 1: two events 10 min apart (one session), then a 40-min
        // gap event → first session closes by GAP
        input.addData(Event(1L, ns(0), 1.0), Event(1L, ns(10), 2.0))
        q.processAllAvailable()
        input.addData(Event(1L, ns(50), 5.0))
        q.processAllAvailable()
        val afterGap = spark.table("sess_out")
          .as[SessionOut].collect()
        afterGap.map(r => (r.user_id, r.n_events, r.sum_value)).toSet shouldBe
          Set((1L, 2L, 3.0))

        // advance the watermark far past user 1's open session via
        // another user; the timeout fires on the following batch
        input.addData(Event(2L, ns(200), 1.0))
        q.processAllAvailable()
        input.addData(Event(2L, ns(201), 1.0))
        q.processAllAvailable()

        val all = spark.table("sess_out").as[SessionOut].collect()
        all.map(r => (r.user_id, r.n_events, r.sum_value)).toSet shouldBe
          Set((1L, 2L, 3.0), (1L, 1L, 5.0)) // open session flushed by timeout
      } finally q.stop()
    }
  }

  describe("tumblingAgg batch/stream parity") {
    it("produces identical buckets on a batch frame and a readStream over the same data") {
      import spark.implicits._
      val dir = "/root/testdata/sf0.001"
      val batch = graft.sources.Tables.load(spark, dir, "events")
        .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      val expected = tumblingAgg(batch)
        .as[(Long, String, Long, Double)].collect().toSet

      val stream = tumblingAgg(readEvents(spark, dir))
      val q = stream.writeStream.format("memory")
        .queryName("tumble_out").outputMode("complete").start()
      try {
        q.processAllAvailable()
        val got = spark.table("tumble_out")
          .as[(Long, String, Long, Double)].collect().toSet
        got shouldBe expected
      } finally q.stop()
    }
  }

  describe("slidingAgg batch/stream parity") {
    it("each event lands in 4 overlapping windows, identically on batch and stream") {
      import spark.implicits._
      val dir = "/root/testdata/sf0.001"
      val batch = graft.sources.Tables.load(spark, dir, "events")
        .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      val expected = slidingAgg(batch)
        .as[(Long, String, Long, Double)].collect().toSet
      // overlap sanity: 4× the tumbling row-weight (same events,
      // hour windows every 15 min)
      val nEvents = batch.count()
      slidingAgg(batch).agg(sum("n_events")).head().getLong(0) shouldBe
        4L * nEvents

      val stream = slidingAgg(readEvents(spark, dir))
      val q = stream.writeStream.format("memory")
        .queryName("slide_out").outputMode("complete").start()
      try {
        q.processAllAvailable()
        val got = spark.table("slide_out")
          .as[(Long, String, Long, Double)].collect().toSet
        got shouldBe expected
      } finally q.stop()
    }
  }

  describe("decontaminateStream") {
    it("matches the batch contamination result in append mode and drops late docs") {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      // eval doc 100 shares a 2-gram window with train docs 1 and 2;
      // doc 3 is clean
      val evalDocs = Seq((100L, "alpha beta gamma delta")).toDF("eval_id", "text")
      val evalGrams = evalDocs.select(col("eval_id"),
        explode(graft.functions.TextHashes.wordShingleHashes(col("text"), 2))
          .as("gram"))
      val t1 = "alpha beta gamma zz"   // shares "alpha beta","beta gamma"
      val t2 = "beta gamma delta yy"   // shares "beta gamma","gamma delta"
      val t3 = "unrelated words only here"

      // batch expectation via the library's batch operator
      val batch = graft.dedup.Dedup.contamination(
        Seq((1L, t1), (2L, t2), (3L, t3)).toDF("doc_id", "text"),
        evalDocs.toDF("doc_id", "text"), "doc_id", "text",
        n = 2, minShared = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      val input = MemoryStream[(Long, String, Long)]
      val docs = input.toDF().toDF("train_id", "text", "min")
        .withColumn("event_time",
          timestamp_millis(expr("86400000 + min * 60000")))
        .withWatermark("event_time", "1 second")
        .select("train_id", "text", "event_time")
      val out = Streams.decontaminateStream(docs, evalGrams,
        nGram = 2, minShared = 2)
      val q = out.writeStream.format("memory")
        .queryName("decon_out").outputMode("append").start()
      try {
        input.addData((1L, t1, 0L), (3L, t3, 1L))
        q.processAllAvailable()
        input.addData((2L, t2, 5L))
        q.processAllAvailable()
        // watermark sentinel far past the 1-hour window closes it
        input.addData((99L, "zzz", 600L))
        q.processAllAvailable()
        val got = spark.table("decon_out")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        got shouldBe batch
        got shouldBe Set((1L, 100L, 2L), (2L, 100L, 2L))

        // a contaminated doc arriving AFTER the watermark passed its
        // window is dropped — state stays bounded, output final
        input.addData((4L, t1, 2L))
        q.processAllAvailable()
        spark.table("decon_out").count() shouldBe 2L
      } finally q.stop()
    }
  }

  describe("dedupStream") {
    it("drops duplicate keys arriving within the watermark window") {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Long, String)]
      val events = input.toDF().toDF("content_hash", "ts", "payload")
        .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
        .withWatermark("event_time", "10 minutes")
      val q = dedupStream(events, Seq("content_hash"))
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").start()
      try {
        input.addData((1L, ns(0), "a"), (1L, ns(1), "a-dup"), (2L, ns(2), "b"))
        q.processAllAvailable()
        input.addData((1L, ns(3), "a-dup2"), (3L, ns(4), "c"))
        q.processAllAvailable()
        val got = spark.table("dedup_out")
          .select("content_hash").as[Long].collect().sorted
        got shouldBe Array(1L, 2L, 3L) // one row per key across batches
      } finally q.stop()
    }
  }

  describe("RocksDB state store compatibility") {
    it("stateful dedup runs against the production RocksDB provider") {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val input = MemoryStream[(Long, Long, String)]
        val events = input.toDF().toDF("content_hash", "ts", "payload")
          .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
          .withWatermark("event_time", "10 minutes")
        val q = dedupStream(events, Seq("content_hash"))
          .writeStream.format("memory").queryName("rocks_out")
          .outputMode("append").start()
        try {
          input.addData((1L, ns(0), "a"), (1L, ns(1), "dup"), (2L, ns(2), "b"))
          q.processAllAvailable()
          spark.table("rocks_out").select("content_hash")
            .as[Long].collect().sorted shouldBe Array(1L, 2L)
        } finally q.stop()
      } finally {
        prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      }
    }
  }

  describe("batch Sessionize (the twin)") {
    it("agrees with the streaming sessionizer on closed sessions") {
      import spark.implicits._
      val events = Seq(
        (1L, ns(0), 1.0), (1L, ns(10), 2.0), (1L, ns(50), 5.0),
        (2L, ns(5), 7.0))
        .toDF("user_id", "ts", "value")
      val out = Sessionize(events, GapNs)
        .select("user_id", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSet
      out shouldBe Set((1L, 2L, 3.0), (1L, 1L, 5.0), (2L, 1L, 7.0))
    }
  }

  describe("funnelStateful") {
    it("carries funnel state across micro-batches and matches the batch operator") {
      implicit val s = spark
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext

      // steps 0,1,2; horizon 100
      val input = MemoryStream[FunnelEvent]
      val out = funnelStateful(input.toDS(), nSteps = 3, horizon = Some(100L))
      val q = out.writeStream.format("memory")
        .queryName("funnel_out").outputMode("update").start()
      try {
        // batch 1: user 1 reaches stage 2; user 2 starts only
        input.addData(
          FunnelEvent(1L, 10L, 1L, 0), FunnelEvent(1L, 20L, 2L, 1),
          FunnelEvent(2L, 10L, 3L, 0))
        q.processAllAvailable()
        val snap1 = spark.table("funnel_out").as[FunnelOut].collect()
          .groupBy(_.user_id).view.mapValues(_.last.stage).toMap
        snap1 shouldBe Map(1L -> 2, 2L -> 1)

        // batch 2: user 1 completes IN the horizon; user 2's step-1
        // event lands OUTSIDE the horizon → stalls at stage 1
        input.addData(
          FunnelEvent(1L, 30L, 4L, 2), FunnelEvent(2L, 150L, 5L, 1))
        q.processAllAvailable()
        val finalSnap = spark.table("funnel_out").as[FunnelOut].collect()
          .groupBy(_.user_id).view
          .mapValues(r => r.maxBy(_.stage)).toMap
        finalSnap(1L).stage shouldBe 3
        finalSnap(1L).complete_ts shouldBe Some(30L)
        finalSnap(2L).stage shouldBe 1

        // batch-mode equivalence: the same events through the same
        // stateful operator in ONE pass == the windowed batch funnel
        val all = Seq(
          (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 4L, "c"),
          (2L, 10L, 3L, "a"), (2L, 150L, 5L, "b"))
          .toDF("k", "ts", "eid", "et")
        val batch = graft.ops.Funnel.stages(all, "k", "ts",
            Seq("a", "b", "c").map(st => st -> (col("et") === st)),
            horizon = Some(100L), tiebreak = Seq("eid"))
          .select("k", "stage").as[(Long, Int)].collect().toMap
        batch shouldBe Map(1L -> 3, 2L -> 1)
      } finally q.stop()
    }
  }
}

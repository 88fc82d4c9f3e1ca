package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Randomized (fixed-seed) invariant checks — property-style tests
  * over generated update sequences, where example-based specs would
  * miss interleavings.
  */
class InvariantSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  describe("PointInTime.join vs a naive interval join on random gapped histories") {
    it("agrees row-for-row, including holes and pre-history facts") {
      import spark.implicits._
      // random histories: per key, sorted change times, ~30% of
      // versions deleted afterward (creating gaps)
      val hist = (1L to 10L).flatMap { k =>
        val times = Seq.fill(6)(rnd.nextInt(1000).toLong).distinct.sorted
        val versions = times.zip(times.drop(1).map(Some(_)) :+ None)
          .map { case (from, to) => (k, from, to, s"v${k}_$from") }
        versions.filter(_ => rnd.nextDouble() > 0.3)
      }.toDF("k", "valid_from", "valid_to", "ver")
      val facts = (1L to 12L).flatMap { k =>
        Seq.fill(20)((k, rnd.nextInt(1100).toLong))
      }.toDF("k", "ts")

      val pit = PointInTime.join(facts, hist, Seq("k"), "ts", Seq("ver"))
        .select("k", "ts", "ver")
        .as[(Long, Long, Option[String])].collect().sorted

      val naive = facts.as("f").join(hist.as("h"),
          col("f.k") === col("h.k") &&
            col("h.valid_from") <= col("f.ts") &&
            (col("h.valid_to").isNull || col("f.ts") < col("h.valid_to")),
          "left")
        .select(col("f.k"), col("f.ts"), col("h.ver"))
        .as[(Long, Long, Option[String])].collect().sorted

      pit shouldBe naive
    }
  }

  describe("SegmentDedup vs a brute-force reference on random corpora") {
    it("keeps exactly the first occurrence of every segment") {
      import spark.implicits._
      // small vocab so cross-doc chunk collisions are common
      val words = Array("a", "b", "c", "d")
      val corpus = (1L to 40L).map { id =>
        id -> Seq.fill(2 + rnd.nextInt(8))(words(rnd.nextInt(4))).mkString(" ")
      }
      val got = graft.dedup.SegmentDedup
        .dedupSegments(corpus.toDF("doc_id", "text"), "doc_id", "text", 2)
        .select("doc_id", "n_segs", "n_kept", "text_kept")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)

      // brute force in plain Scala
      def chunks(t: String) = t.split(" ").grouped(2).map(_.mkString(" ")).toSeq
      val seen = scala.collection.mutable.Set[String]()
      val expect = corpus.sortBy(_._1).map { case (id, t) =>
        val segs = chunks(t)
        val kept = segs.filter(s => seen.add(s))
        (id, segs.length.toLong, kept.length.toLong, kept.mkString(" "))
      }
      got shouldBe expect.toArray
    }
  }

  describe("Packing conservation on random inputs") {
    it("assigns every token to exactly one sequence at any block size") {
      import spark.implicits._
      val df = (1L to 300L).map(i => (i, 1L + rnd.nextInt(50).toLong))
        .toDF("id", "tok")
      val total = df.agg(sum("tok")).as[Long].head()
      for (block <- Seq(1L, 7L, 64L, 100000L)) {
        val spans = Packing.packSpans(df, "id", "tok", block)
        spans.agg(sum("n_tokens")).as[Long].head() shouldBe total
        // no sequence overflows, every span positive
        val bad = spans.groupBy("seq_id").agg(sum("n_tokens").as("s"))
          .filter(col("s") > block).count()
        bad shouldBe 0L
        spans.filter(col("n_tokens") <= 0).count() shouldBe 0L
      }
    }
  }

  describe("Snapshot SCD2 invariants over random update sequences") {
    it("holds: one open row per live key, no interval overlap, monotonic versions") {
      import spark.implicits._
      // 3 rounds of random states over a small key space, chained
      val keySpace = 1L to 8L
      def randomState(round: Int): DataFrame =
        keySpace.filter(_ => rnd.nextDouble() < 0.8)
          .map(k => (k, java.sql.Timestamp.valueOf(f"200$round-01-01 00:00:00"),
            rnd.nextInt(5)))
          .toDF("k", "u", "v")

      var hist: Option[DataFrame] = None
      for (r <- 1 to 3) {
        hist = Some(Snapshot.timestamp(hist, randomState(r), Seq("k"), "u"))
      }
      val h = hist.get.select("k", "u", "v", Snapshot.ValidFrom, Snapshot.ValidTo)
        .as[(Long, java.sql.Timestamp, Int, java.sql.Timestamp, Option[java.sql.Timestamp])]
        .collect()

      // exactly one open row per key that ever appeared
      val open = h.filter(_._5.isEmpty)
      open.map(_._1).distinct.length shouldBe open.length
      h.map(_._1).toSet shouldBe open.map(_._1).toSet

      // per key: versions ordered, intervals chain (valid_to == next valid_from)
      h.groupBy(_._1).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._4.getTime)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            a._5 should not be empty // only the last is open
            a._5.get shouldBe b._4 // chained intervals
            assert(a._4.getTime < b._4.getTime)
          case _ =>
        }
        sorted.last._5 shouldBe empty
      }
    }
  }

  describe("Writer.merge algebraic properties") {
    it("is idempotent and last-batch-wins over random batches") {
      import spark.implicits._
      def randomBatch() = (1L to 20L)
        .filter(_ => rnd.nextBoolean())
        .map(k => (k, rnd.nextInt(100))).toDF("k", "v")

      for (_ <- 1 to 3) {
        val e = randomBatch()
        val b = randomBatch()
        val once = Writer.merge(e, b, Seq("k"))
        val twice = Writer.merge(once, b, Seq("k"))
        val got = twice.as[(Long, Int)].collect().toSet
        got shouldBe once.as[(Long, Int)].collect().toSet
        // every batch key's value comes from the batch
        val bm = b.as[(Long, Int)].collect().toMap
        got.filter(r => bm.contains(r._1)).foreach { case (k, v) =>
          v shouldBe bm(k)
        }
      }
    }
  }

  describe("Sessionize conservation") {
    it("partitions every event into exactly one session") {
      import spark.implicits._
      val n = 500
      val events = (1 to n).map { _ =>
        (rnd.nextInt(10).toLong,
          (86400L + rnd.nextInt(100000)) * 1000000000L,
          1.0)
      }.toDF("user_id", "ts", "value")
      val sessions = Sessionize(events, 1800L * 1000000000L)
      sessions.agg(sum("n_events")).head().getLong(0) shouldBe n.toLong
      // session time ranges per user never overlap
      val rows = sessions.select("user_id", "start_ms", "end_ms")
        .as[(Long, Long, Long)].collect()
      rows.groupBy(_._1).foreach { case (_, ss) =>
        ss.sortBy(_._2).sliding(2).foreach {
          case Array(a, b) => assert(a._3 < b._2)
          case _ =>
        }
      }
    }
  }
}

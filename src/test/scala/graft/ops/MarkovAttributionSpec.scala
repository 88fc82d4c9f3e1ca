package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarkovAttributionSpec extends SparkSpec {
  import spark.implicits._

  // journeys (user, step, channel):
  //   u1: a -> buy         u2: a -> b -> buy
  //   u3: b (no buy)       u4: b -> buy
  private def events = Seq(
    (1L, 1L, "a"), (1L, 2L, "buy"),
    (2L, 3L, "a"), (2L, 4L, "b"), (2L, 5L, "buy"),
    (3L, 6L, "b"),
    (4L, 7L, "b"), (4L, 8L, "buy"))
    .map { case (u, i, c) =>
      (u, new java.sql.Timestamp(i * 1000L), i, c) }
    .toDF("user_id", "ts", "event_id", "event_type")

  describe("MarkovAttribution.transitions") {
    it("truncates at first conversion and closes open journeys with NULL") {
      val tr = MarkovAttribution.transitions(events, "user_id",
          "event_type", "ts", "event_id", "buy")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      tr(("START", "a")) shouldBe 2L
      tr(("START", "b")) shouldBe 2L
      tr(("a", "CONV")) shouldBe 1L
      tr(("a", "b")) shouldBe 1L
      tr(("b", "CONV")) shouldBe 2L
      tr(("b", "NULL")) shouldBe 1L
      tr.values.sum shouldBe 9L
    }
  }

  describe("MarkovAttribution.attribute") {
    it("removal of the only converting path zeroes conversion") {
      // chain: START -> a -> CONV only; removing a must kill all mass
      val solo = Seq((1L, 1L, "a"), (1L, 2L, "buy"))
        .map { case (u, i, c) =>
          (u, new java.sql.Timestamp(i * 1000L), i, c) }
        .toDF("user_id", "ts", "event_id", "event_type")
      val out = MarkovAttribution.attribute(solo, "user_id",
          "event_type", "ts", "event_id", "buy", Seq("a", "zzz"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      out("a")._2 shouldBe 0L // removed mass
      out("a")._3 shouldBe 1.0 // full removal effect
      out("zzz")._2 shouldBe out("zzz")._1 // absent channel: no effect
      out("zzz")._3 shouldBe 0.0
    }
    it("matches the generated SQL oracle run through Spark") {
      events.createOrReplaceTempView("mk_events")
      val sql = MarkovAttribution.sql(
        "SELECT user_id AS u, CASE WHEN event_type = 'buy' THEN 'CONV' " +
          "ELSE event_type END AS ch, ts, event_id AS eid FROM mk_events",
        Seq("a", "b"), iters = 8)
      val viaSql = spark.sql(
          sql.replace("//", "div").replace("(ts, eid)", "struct(ts, eid)")
            .replace(" AS MATERIALIZED (", " AS ("))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val viaOp = MarkovAttribution.attribute(events, "user_id",
          "event_type", "ts", "event_id", "buy", Seq("a", "b"), iters = 8)
        .orderBy("channel")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      viaSql.toSeq shouldBe viaOp.toSeq
    }
    it("credit favors the channel on more converting paths") {
      val out = MarkovAttribution.attribute(events, "user_id",
          "event_type", "ts", "event_id", "buy", Seq("a", "b"))
        .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
      // b sits on two of three converting journeys and closes a's
      // assisted one; removing it must cost more than removing a
      out("b") should be > out("a")
      (out("a") + out("b")) shouldBe (1.0 +- 1e-9)
    }
  }
}

package graft.ops

import graft.SparkSpec

/** Integer fixed-point HITS (q147): checked against an independent
  * driver-side implementation of the SAME recurrence, plus the
  * structural properties Kleinberg's definitions imply.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000L

  /** Reference recurrence on the driver — deliberately naive. */
  private def reference(edges: Seq[(String, String)], iters: Int)
      : Map[String, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var hub = nodes.map(_ -> Scale).toMap
    var auth = Map.empty[String, Long]
    def normalize(raw: Map[String, Long]): Map[String, Long] = {
      val den = math.max(raw.values.sum / Scale, 1L)
      nodes.map(n => n -> raw.getOrElse(n, 0L) / den).toMap
    }
    for (_ <- 1 to iters) {
      auth = normalize(e.groupBy(_._2).map { case (v, es) =>
        v -> es.map(x => hub(x._1)).sum })
      hub = normalize(e.groupBy(_._1).map { case (u, es) =>
        u -> es.map(x => auth(x._2)).sum })
    }
    nodes.map(n => n -> (hub(n), auth(n))).toMap
  }

  private val graph = Seq(
    "a" -> "c", "b" -> "c", "c" -> "d", "a" -> "d", "b" -> "a",
    "a" -> "c" /* dup edge must collapse */)

  it("matches the driver-side reference recurrence exactly") {
    val out = Hits.run(graph.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out shouldBe reference(graph, 4)
  }

  it("ranks the all-cited node as top authority, pure citers as hubs") {
    val out = Hits.run(graph.toDF("src", "dst"), "src", "dst", iters = 6)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val auth = out.view.mapValues(_._2).toMap
    auth("c") should be >= auth("d")
    auth("c") should be > auth("a")
    // d never links out: zero hub; b is never linked: zero authority
    out("d")._1 shouldBe 0L
    out("b")._2 shouldBe 0L
  }

  it("is deterministic across runs (barriered raw sums are pure)") {
    val df = graph.toDF("src", "dst")
    def once() = Hits.run(df, "src", "dst", iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    once() shouldBe once()
  }

  it("drops null endpoints instead of propagating them") {
    val df = Seq(("a", "b"), ("a", null), (null, "b"))
      .toDF("src", "dst")
    val out = Hits.run(df, "src", "dst", iters = 2)
      .collect().map(_.getString(0)).toSet
    out shouldBe Set("a", "b")
  }
}

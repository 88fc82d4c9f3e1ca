package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VocabScrubSpec extends SparkSpec {
  import spark.implicits._

  describe("VocabCoverage.curve") {
    it("covers everything once K reaches the vocabulary size") {
      val docs = Seq("a a a b b c", "a b d").toDF("text")
      val out = VocabCoverage.curve(docs, "text", Seq(1, 2, 4))
        .collect().map(r => r.getAs[Long]("vocab_k") ->
          (r.getAs[Double]("coverage"), r.getAs[Long]("n_types"))).toMap
      // f: a=4, b=3, c=1, d=1; total 9
      out(1L)._1 shouldBe 4.0 / 9 +- 1e-9
      out(2L)._1 shouldBe 7.0 / 9 +- 1e-9
      out(4L)._1 shouldBe 1.0
      out(4L)._2 shouldBe 4L
    }
    it("coverage + oov_rate is exactly 1 after rounding") {
      val docs = Seq("x y z x").toDF("text")
      VocabCoverage.curve(docs, "text", Seq(2)).collect().foreach { r =>
        (r.getAs[Double]("coverage") + r.getAs[Double]("oov_rate")
          ) shouldBe 1.0 +- 1e-9
      }
    }
    it("matches the serial walk on a large Zipf-ish vocabulary " +
        "(5000 types, heavy ties) — the bucketed-scan regime") {
      // token tNNNN repeated (5000/n rounded) times: many distinct
      // frequencies AND long tie runs inside single buckets
      val freqs = (1 to 5000).map(i => (f"t$i%04d", 5000 / i))
      val docs = freqs.map { case (t, f) => (s"$t " * f).trim }
        .grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
      val cutoffs = Seq(1, 10, 137, 999, 5000)
      val got = VocabCoverage.curve(docs, "text", cutoffs).collect()
        .map(r => r.getAs[Long]("vocab_k") ->
          ((r.getAs[Long]("n_types"), r.getAs[Long]("covered_occ"),
            r.getAs[Long]("total_occ")))).toMap
      // serial reference: rank on (f desc, token asc)
      val ranked = freqs.map { case (t, f) => (t, f.toLong) }
        .sortBy { case (t, f) => (-f, t) }
      val total = ranked.map(_._2).sum
      cutoffs.foreach { k =>
        val head = ranked.take(k)
        withClue(s"cutoff $k: ") {
          got(k.toLong) shouldBe ((head.length.toLong,
            head.map(_._2).sum, total))
        }
      }
    }
    it("plans the vocabulary scan bucket-partitioned — no " +
        "unpartitioned data-sized window (VERDICT r13 item 1)") {
      val docs = Seq("a b c a b a").toDF("text")
      val plan = VocabCoverage.curve(docs, "text", Seq(2))
        .queryExecution.optimizedPlan.toString
      // the data-sized rank/cum window partitions by the range
      // bucket __vb; the only orderBy-without-partition frame left
      // is the offs scan (<= 257 rows)
      plan should include("__vb")
    }
  }

  describe("RareTokenScrub.scrub") {
    it("drops df=1 tokens and keeps position order") {
      val docs = Seq((1L, "the secret123 cat"), (2L, "the cat sleeps"))
        .toDF("id", "text")
      val out = RareTokenScrub.scrub(docs, "id", "text").collect()
        .map(r => r.getAs[Long]("id") ->
          (r.getAs[String]("scrubbed_text"),
            r.getAs[Long]("n_scrubbed"))).toMap
      out(1L) shouldBe (("the cat", 1L))
      out(2L) shouldBe (("the cat", 1L)) // "sleeps" is df=1 too
    }
    it("reconstructs the empty string when everything is rare") {
      val docs = Seq((1L, "unique1 unique2")).toDF("id", "text")
      val r = RareTokenScrub.scrub(docs, "id", "text").collect().head
      r.getAs[String]("scrubbed_text") shouldBe ""
      r.getAs[Long]("n_kept") shouldBe 0L
    }
  }

  describe("quality.Srm.check") {
    import graft.quality.Srm
    it("passes a fair split and flags a broken one") {
      val fair = (1 to 1000).map(i => ("g", i % 2L)).toDF("g", "b")
      Srm.check(fair, "g", col("b") === 1L).collect()
        .head.getAs[Boolean]("srm_detected") shouldBe false
      val broken = ((1 to 700).map(_ => ("g", 0L)) ++
        (1 to 300).map(_ => ("g", 1L))).toDF("g", "b")
      val r = Srm.check(broken, "g", col("b") === 1L).collect().head
      // χ² = 400²/1000 = 160 >> 10.83
      r.getAs[Double]("chi2") shouldBe 160.0
      r.getAs[Boolean]("srm_detected") shouldBe true
    }
  }

  describe("ops.GoldenRecord.survive") {
    import graft.ops.GoldenRecord
    it("elects per-field winners independently") {
      val rows = Seq(
        (1L, "Jon Smith", 100L, "B"),
        (1L, "Jonathan Smith", 50L, "A"),
        (9L, "Solo", 7L, "Z")).toDF("cluster_id", "name", "value", "phone")
      val out = GoldenRecord.survive(rows, "cluster_id", "name",
        "value", "phone").collect()
        .map(r => r.getAs[Long]("cluster_id") -> r).toMap
      val g = out(1L)
      g.getAs[String]("golden_name") shouldBe "Jonathan Smith"
      g.getAs[Long]("golden_value") shouldBe 100L
      g.getAs[String]("golden_phone") shouldBe "A"
      out(9L).getAs[Long]("n_members") shouldBe 1L
    }
  }
}

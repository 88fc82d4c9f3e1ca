package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class FreqSketchSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private def topK(df: org.apache.spark.sql.DataFrame, m: Int, k: Int) =
    df.agg(FreqSketchAgg.freqSketch(col("tok"), m).as("sk"))
      .select(explode(FreqSketchAgg.freqTopK(col("sk"), k)).as("r"))
      .select("r.item", "r.estimate", "r.lower_bound", "r.upper_bound")
      .as[(String, Long, Long, Long)].collect()

  describe("FreqSketchAgg") {
    it("is exact while the vocabulary fits the counter map") {
      val toks = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c")
      val got = topK(toks.toDF("tok"), m = 64, k = 3)
      got.map(r => (r._1, r._2)) shouldBe Array(("a", 40L), ("b", 25L), ("c", 9L))
      // no purge ⇒ bounds collapse onto the estimate
      got.foreach { r => r._3 shouldBe r._2; r._4 shouldBe r._2 }
    }

    it("under purge pressure: bounds bracket truth, heavy item never missed") {
      // Zipf-ish: one heavy item among 500 distinct light ones, map of 32
      val heavy = Seq.fill(400)("HEAVY")
      val light = (0 until 500).flatMap(i => Seq.fill(3)(s"light-$i"))
      val rows = topK((heavy ++ light).toDF("tok"), m = 32, k = 5)
      val h = rows.find(_._1 == "HEAVY")
      h should not be empty // NO_FALSE_NEGATIVES: true 400 >> n·ε
      val (_, est, lb, ub) = h.get
      lb should be <= 400L
      ub should be >= 400L
      est should be >= 400L // MG overestimates: true <= est <= true + n·ε
      est should be <= ub
    }

    it("merge of per-shard sketches equals the single-pass sketch (exact regime)") {
      val df = (0 until 300)
        .map(i => (i % 4, s"t${i % 7}")).toDF("shard", "tok")
      val merged = df.groupBy("shard")
        .agg(FreqSketchAgg.freqSketch(col("tok")).as("sk"))
        .agg(FreqSketchAgg.freqMerge(col("sk")).as("sk"))
        .select(explode(FreqSketchAgg.freqTopK(col("sk"), 7)).as("r"))
        .select("r.item", "r.estimate").as[(String, Long)].collect().sorted
      val direct = df
        .agg(FreqSketchAgg.freqSketch(col("tok")).as("sk"))
        .select(explode(FreqSketchAgg.freqTopK(col("sk"), 7)).as("r"))
        .select("r.item", "r.estimate").as[(String, Long)].collect().sorted
      merged shouldBe direct
    }

    it("nulls are skipped; all-null input yields a null sketch") {
      val got = Seq(Some("x"), None, Some("x"), None).toDF("tok")
        .agg(FreqSketchAgg.freqSketch(col("tok")).as("sk"))
        .select(explode(FreqSketchAgg.freqTopK(col("sk"), 1)).as("r"))
        .select("r.item", "r.estimate").as[(String, Long)].collect()
      got shouldBe Array(("x", 2L))
      Seq(Option.empty[String]).toDF("tok")
        .agg(FreqSketchAgg.freqSketch(col("tok")).as("sk"))
        .select(FreqSketchAgg.freqTopK(col("sk"), 1))
        .collect().head.isNullAt(0) shouldBe true
    }

    it("rejects a non-power-of-2 map size and non-positive k") {
      // runtime errors surface wrapped in SparkException — check the chain
      val e = intercept[Exception] {
        Seq("a").toDF("tok")
          .agg(FreqSketchAgg.freqSketch(col("tok"), 100)).collect()
      }
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(_.isInstanceOf[IllegalArgumentException]) shouldBe true
      an[IllegalArgumentException] should be thrownBy
        FreqSketchAgg.freqTopK(lit(Array.emptyByteArray), 0)
    }
  }
}

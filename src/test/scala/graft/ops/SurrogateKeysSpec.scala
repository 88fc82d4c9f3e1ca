package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SurrogateKeysSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  describe("SurrogateKeys.assign") {
    it("matches the naive global row_number exactly") {
      val df = (1 to 500).map(i => (i % 37, i % 11)).toDF("a", "b")
        .repartition(7)
      val got = SurrogateKeys.assign(df, Seq("a", "b"),
          bucket = col("a") % 37 / 10, base = 100L)
        .orderBy("surrogate_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      val want = df.select("a", "b").distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1)))
        .sorted.zipWithIndex
        .map { case ((a, b), i) => (100L + i, a, b) }
      got shouldBe want
    }

    it("ids are dense: min = base, max = base + n - 1, no gaps") {
      val df = (1 to 300).map(i => Tuple1(i * 3 % 101)).toDF("k")
      val ids = SurrogateKeys.assign(df, Seq("k"), col("k") / 25)
        .select("surrogate_id").collect().map(_.getLong(0)).sorted
      ids.head shouldBe 1
      ids.last shouldBe ids.length
      ids.toSeq shouldBe (1L to ids.length)
    }

    it("is stable under repartitioning") {
      val rows = (1 to 200).map(i => Tuple1(s"k${i % 53}"))
      val a = SurrogateKeys.assign(rows.toDF("k").repartition(3),
        Seq("k"), ascii(substring(col("k"), 2, 1)))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      val b = SurrogateKeys.assign(rows.toDF("k").repartition(17),
        Seq("k"), ascii(substring(col("k"), 2, 1)))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      a shouldBe b
    }
  }
}

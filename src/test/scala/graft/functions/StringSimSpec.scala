package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StringSimSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimExprs.jaroWinklerEval(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  describe("StringSimExprs.jaroWinkler") {
    it("matches DuckDB's jaro_winkler_similarity on the classic pairs") {
      // expected values are DuckDB 'SELECT jaro_winkler_similarity(a,b)'
      // outputs, captured verbatim — the oracle-parity contract
      val cases = Seq(
        ("martha", "marhta", 0.9611111111111111),
        ("dwayne", "duane", 0.8400000000000001),
        ("DIXON", "DICKSONX", 0.8133333333333332),
        ("abcxxxxx", "abcyyyyyyyy", 0.5492424242424242), // no boost ≤ 0.7
        ("aaab", "aaac", 0.8833333333333334),
        ("xy", "xz", 0.6666666666666666), // jaro 2/3, boost suppressed
        ("prefix_same", "prefix_diff", 0.8545454545454545), // prefix cap 4
        ("ab", "ba", 0.0), // window 0: transposed pair never matches
        ("", "abc", 0.0),
        ("abc", "abc", 1.0))
      cases.foreach { case (a, b, want) =>
        jw(a, b) shouldBe (want +- 1e-12)
      }
    }
    it("is symmetric and null-safe through the Column API") {
      val df = Seq(("martha", "marhta"), (null, "x"), ("x", null))
        .toDF("a", "b")
      val out = df.select(
        StringSimExprs.jaroWinkler(col("a"), col("b")).as("s1"),
        StringSimExprs.jaroWinkler(col("b"), col("a")).as("s2"))
        .collect()
      out(0).getDouble(0) shouldBe out(0).getDouble(1)
      out(1).isNullAt(0) shouldBe true
      out(2).isNullAt(0) shouldBe true
    }
    it("compares by code point (astral chars count once)") {
      // U+1D400 (2 UTF-16 chars): identical strings with astral
      // content must score 1, and one substitution over length-2
      // code-point strings scores like any 2-char pair
      val s = "𝐀z"
      jw(s, s) shouldBe 1.0
      jw("𝐀z", "𝐀q") shouldBe (jw("az", "aq") +- 1e-12)
    }
    it("stays inside whole-stage codegen") {
      val df = spark.range(100).selectExpr(
        "CAST(id AS STRING) AS a", "CAST(id + 1 AS STRING) AS b")
      val out = df.select(StringSimExprs.jaroWinkler(col("a"), col("b")))
      out.collect() // forces codegen path; defineCodeGen would throw
      // on a compile error in the generated forwarder call
      out.queryExecution.executedPlan.toString should include ("Project")
    }
  }
}

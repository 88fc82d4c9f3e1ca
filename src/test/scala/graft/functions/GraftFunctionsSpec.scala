package graft.functions

import org.apache.spark.sql.functions._
import graft.{GraftExtensions, SparkSpec}

class GraftFunctionsSpec extends SparkSpec {

  describe("SQL registration") {
    it("registers graft_* functions usable from spark.sql") {
      import spark.implicits._
      GraftExtensions.register(spark)
      Seq("a b c d").toDF("text").createOrReplaceTempView("gfs_docs")
      val viaSql = spark.sql(
        """SELECT graft_simhash64(text) AS fp,
          |  size(graft_word_shingle_hashes(text, 2)) AS n,
          |  size(graft_minhash_signature(
          |    graft_word_shingle_hashes(text, 2), 8)) AS sig_n
          |FROM gfs_docs""".stripMargin)
        .as[(Long, Int, Int)].head()
      // the full registered surface resolves from SQL
      spark.sql(
        """SELECT graft_simhash_poly64(text), size(graft_word_bigrams(text)),
          |  graft_bigram_max_mult(text), graft_lang_predict(text)
          |FROM gfs_docs""".stripMargin).collect().length shouldBe 1
      val viaColumns = Seq("a b c d").toDF("text")
        .select(Seq(TextHashes.simhash64(col("text")).as("fp"),
          org.apache.spark.sql.functions.size(
            TextHashes.wordShingleHashes(col("text"), 2)).as("n")): _*)
        .as[(Long, Int)].head()
      assert(viaSql._1 == viaColumns._1)
      assert(viaSql._2 == viaColumns._2)
      assert(viaSql._3 == 8)
    }
    it("registers graft_cosine over float and double arrays") {
      GraftExtensions.register(spark)
      val r = spark.sql(
        """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS same,
          |  graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS orth""".stripMargin)
        .head()
      r.getDouble(0) shouldBe 1.0 +- 1e-12
      r.getDouble(1) shouldBe 0.0 +- 1e-12
    }
    it("registers graft_mix30, matching the JVM mix and the Column form") {
      GraftExtensions.register(spark)
      val viaSql = spark.sql(
        "SELECT graft_mix30(12345L) AS m, graft_mix30(0L) AS z").head()
      viaSql.getLong(0) shouldBe
        graft.functions.TextHashExprs.mix30(12345L)
      viaSql.getLong(1) shouldBe graft.functions.TextHashExprs.mix30(0L)
    }
    it("rejects a non-literal shingle size") {
      GraftExtensions.register(spark)
      an[Exception] should be thrownBy
        spark.sql("SELECT graft_word_shingle_hashes('a', length('xx'))").collect()
    }
  }

  describe("codegen path") {
    it("evaluates inside whole-stage codegen (no fallback) and agrees with interpreted eval") {
      import spark.implicits._
      // spark.range keeps the projection physical (a local Seq would
      // be folded into a LocalTableScan, bypassing codegen entirely)
      val df = spark.range(1, 101)
        .select(concat(lit("tok"), col("id"), lit(" alpha beta gamma tok"),
          pmod(col("id"), lit(7))).as("text"))
        .select(TextHashes.simhash64(col("text")).as("fp"),
          TextHashes.wordShingleHashes(col("text"), 3).as("hs"))
      // the "*(n)" prefix marks operators inside a WholeStageCodegen
      // stage — the sketch projection must carry it (a CodegenFallback
      // expression would strip it from its Project)
      val plan = df.queryExecution.executedPlan.toString
      plan.linesIterator.find(_.contains("graft_simhash64"))
        .getOrElse(fail("sketch projection not found in plan"))
        .trim should startWith("*(")
      val rows = df.as[(Long, Array[Long])].collect()
      rows.length shouldBe 100
      // spot-check one row against the direct helper
      val direct = TextHashExprs.simhashEval(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          "tok1 alpha beta gamma tok1"))
      assert(rows.head._1 == direct)
    }
  }
}

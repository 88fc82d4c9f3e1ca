package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class AvroScriptsSpec extends SparkSpec {
  import spark.implicits._

  describe("AvroSource") {
    val schemaJson =
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},
        |{"name":"name","type":"string"},
        |{"name":"score","type":["null","double"]}]}""".stripMargin
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))

    it("round-trips rows through a real Avro container") {
      val dir = "target/scratch/avro_spec_rt"
      new java.io.File(dir).mkdirs()
      AvroSource.writeLocal(s"$dir/a.avro", schemaJson,
        Iterator(Seq(1L, "x", 1.5), Seq(2L, "y", null)))
      val out = AvroSource.read(spark, dir, schema)
        .orderBy("id").collect()
      out.length shouldBe 2
      out(0).getLong(0) shouldBe 1L
      out(0).getString(1) shouldBe "x"
      out(0).getDouble(2) shouldBe 1.5
      out(1).isNullAt(2) shouldBe true
    }
    it("reads multiple containers as one relation") {
      val dir = "target/scratch/avro_spec_multi"
      new java.io.File(dir).mkdirs()
      AvroSource.writeLocal(s"$dir/a.avro", schemaJson,
        Iterator(Seq(1L, "a", 0.0)))
      AvroSource.writeLocal(s"$dir/b.avro", schemaJson,
        Iterator(Seq(2L, "b", 0.0), Seq(3L, "c", 0.0)))
      AvroSource.read(spark, dir, schema).count() shouldBe 3L
    }
  }

  describe("text.Scripts.census") {
    import graft.text.Scripts
    it("attributes chars to the right scripts") {
      val df = Seq(("g", "abc 好好 где 12")).toDF("g", "text")
      val r = Scripts.census(df, "g", "text").collect().head
      val nChars = r.getAs[Long]("n_chars")
      nChars shouldBe 13L // 10 letters/digits + 3 spaces
      r.getAs[Double]("share_latin") shouldBe 3.0 / 13 +- 1e-9
      r.getAs[Double]("share_han") shouldBe 2.0 / 13 +- 1e-9
      r.getAs[Double]("share_cyrillic") shouldBe 3.0 / 13 +- 1e-9
      r.getAs[Double]("share_digit") shouldBe 2.0 / 13 +- 1e-9
    }
    it("nulls shares for empty text") {
      val df = Seq(("g", "")).toDF("g", "text")
      val r = Scripts.census(df, "g", "text").collect().head
      r.isNullAt(r.fieldIndex("share_latin")) shouldBe true
    }
  }

  describe("streaming.StreamSink.appendExactlyOnce") {
    import graft.streaming.StreamSink
    it("applies a fresh batch and skips its replay") {
      val base = "target/scratch/eo_spec"
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      StreamSink.appendExactlyOnce(batch, 7L,
        s"$base/t", s"$base/ledger") shouldBe true
      StreamSink.appendExactlyOnce(batch, 7L,
        s"$base/t", s"$base/ledger") shouldBe false
      spark.read.parquet(s"$base/t").count() shouldBe 2L
      // a NEW batch id still applies
      StreamSink.appendExactlyOnce(batch, 8L,
        s"$base/t", s"$base/ledger") shouldBe true
      spark.read.parquet(s"$base/t").count() shouldBe 4L
    }
  }
}

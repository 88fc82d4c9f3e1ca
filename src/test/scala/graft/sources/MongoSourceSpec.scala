package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import graft.SparkSpec

/** MongoSource over Extended JSON v2 dumps: canonical and relaxed
  * wrappers, ObjectId stringification, collection discovery.
  */
class MongoSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("_id", StringType),
    StructField("n", IntegerType),
    StructField("big", LongType),
    StructField("x", DoubleType),
    StructField("amount", DecimalType(10, 2)),
    StructField("created", TimestampType),
    StructField("tag", StringType)))

  private def write(name: String, lines: Seq[String]): String = {
    val dir = Paths.get(s"target/scratch/mongo_spec_$name")
    Files.createDirectories(dir)
    val f = dir.resolve(s"$name.json")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  describe("canonical mode") {
    it("unwraps $oid/$numberInt/$numberLong/$numberDouble/$numberDecimal/$date") {
      val dir = write("canon", Seq(
        """{"_id":{"$oid":"507f1f77bcf86cd799439011"},"n":{"$numberInt":"7"},""" +
          """"big":{"$numberLong":"9007199254740993"},"x":{"$numberDouble":"1.5"},""" +
          """"amount":{"$numberDecimal":"12.34"},""" +
          """"created":{"$date":{"$numberLong":"86400000"}},"tag":"a"}"""))
      val row = MongoSource.readCollection(spark, s"$dir/canon.json", schema,
        MongoSource.MongoConfig(mode = "canonical")).collect().head
      row.getString(0) shouldBe "507f1f77bcf86cd799439011"
      row.getInt(1) shouldBe 7
      row.getLong(2) shouldBe 9007199254740993L // > 2^53: string-wrapped long survives
      row.getDouble(3) shouldBe 1.5
      row.getDecimal(4) shouldBe new java.math.BigDecimal("12.34")
      row.getTimestamp(5).toInstant.toEpochMilli shouldBe 86400000L
      row.getString(6) shouldBe "a"
    }
  }

  describe("relaxed mode (mongoexport default)") {
    it("reads plain numbers, ISO dates, and wrapped oid/decimal") {
      val dir = write("relax", Seq(
        """{"_id":{"$oid":"507f1f77bcf86cd799439012"},"n":7,""" +
          """"big":123456789,"x":1.5,"amount":{"$numberDecimal":"12.34"},""" +
          """"created":{"$date":"1970-01-02T00:00:00Z"},"tag":"b"}"""))
      val row = MongoSource.readCollection(spark, s"$dir/relax.json", schema,
        MongoSource.MongoConfig(mode = "relaxed")).collect().head
      row.getString(0) shouldBe "507f1f77bcf86cd799439012"
      row.getInt(1) shouldBe 7
      row.getLong(2) shouldBe 123456789L
      row.getTimestamp(5).toInstant.toEpochMilli shouldBe 86400000L
    }
  }

  describe("MongoSource.read") {
    it("discovers collections from the dump directory") {
      val miniSchema = StructType(Seq(StructField("v", IntegerType)))
      val dir = write("db", Seq("""{"v":1}""", """{"v":2}"""))
      Files.write(Paths.get(dir, "other.json"), """{"v":3}""".getBytes)
      val tables = MongoSource.read(spark, dir,
        schemas = Map("db" -> miniSchema, "other" -> miniSchema),
        cfg = MongoSource.MongoConfig(mode = "relaxed"))
      tables.keySet shouldBe Set("db", "other")
      tables("db").count() shouldBe 2L
      tables("other").count() shouldBe 1L
    }

    it("fails loudly when a discovered collection has no schema") {
      val dir = write("noschema", Seq("""{"v":1}"""))
      an[IllegalArgumentException] should be thrownBy
        MongoSource.read(spark, dir, schemas = Map.empty)
    }

    it("rejects an unknown Extended JSON mode") {
      an[IllegalArgumentException] should be thrownBy
        MongoSource.readCollection(spark, "/nonexistent",
          StructType(Seq(StructField("created", TimestampType))),
          MongoSource.MongoConfig(mode = "bson"))
    }
  }
}

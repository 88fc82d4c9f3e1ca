package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.types._
import graft.SparkSpec

/** SheetsSource against a local fixture speaking the Sheets API v4
  * metadata + values shapes: id-from-URL, discovery, header
  * snake_casing, schema typing, auth passthrough.
  */
class SheetsSourceSpec extends SparkSpec {

  describe("SheetsSource.spreadsheetId") {
    it("extracts the id from a full URL and passes a bare id through") {
      SheetsSource.spreadsheetId(
        "https://docs.google.com/spreadsheets/d/abc_DEF-123/edit#gid=0"
      ) shouldBe "abc_DEF-123"
      SheetsSource.spreadsheetId("abc_DEF-123") shouldBe "abc_DEF-123"
    }
  }

  describe("SheetsSource.parseValues") {
    val body =
      """{"range":"S1!A1:C3","majorDimension":"ROWS","values":[
        |["User Id","Full Name","Score"],
        |["1","ada","9.5"],
        |["2","grace",""]]}""".stripMargin

    it("snake_cases the header row and leaves values as strings") {
      val df = SheetsSource.parseValues(spark, body, None)
      df.columns.toSeq shouldBe Seq("user_id", "full_name", "score")
      df.collect().map(_.getString(0)).sorted.toSeq shouldBe Seq("1", "2")
    }

    it("types columns when a schema is given") {
      val schema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("full_name", StringType),
        StructField("score", DoubleType)))
      val rows = SheetsSource.parseValues(spark, body, Some(schema))
        .orderBy("user_id").collect()
      rows.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
      rows(0).getDouble(2) shouldBe 9.5
      rows(1).isNullAt(2) shouldBe true // empty cell → null double
    }

    it("fails loudly on a sheet with no header row") {
      an[Exception] should be thrownBy SheetsSource.parseValues(
        spark, """{"range":"S1","majorDimension":"ROWS","values":[]}""", None)
    }
  }

  describe("SheetsSource.read") {
    def withFixture[T](f: String => T): T = {
      val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/v4/spreadsheets/fix", { (ex: HttpExchange) =>
        val authed = Option(ex.getRequestHeaders.getFirst("Authorization"))
          .contains("Bearer tok")
        val path = ex.getRequestURI.getPath
        val body =
          if (!authed) """{"error":"unauthorized"}"""
          else if (!path.contains("/values/"))
            """{"sheets":[{"properties":{"title":"Main Data"}},
              |{"properties":{"title":"Lookup"}}]}""".stripMargin
          else if (path.endsWith("/values/Main Data"))
            """{"values":[["K","V"],["1","a"],["2","b"]]}"""
          else """{"values":[["K","Label"],["1","one"]]}"""
        val b = body.getBytes("UTF-8")
        ex.sendResponseHeaders(if (authed) 200 else 401, b.length.toLong)
        ex.getResponseBody.write(b)
        ex.close()
      })
      server.start()
      try f(s"http://127.0.0.1:${server.getAddress.getPort}")
      finally server.stop(0)
    }

    it("discovers all worksheets and loads each as a snake_cased table") {
      withFixture { endpoint =>
        val tables = SheetsSource.read(spark, endpoint, "fix",
          cfg = SheetsSource.SheetsConfig(
            headers = Map("Authorization" -> "Bearer tok")))
        tables.keySet shouldBe Set("main_data", "lookup")
        tables("main_data").count() shouldBe 2L
        tables("lookup").columns.toSeq shouldBe Seq("k", "label")
      }
    }

    it("honors an explicit sheet-name list") {
      withFixture { endpoint =>
        val tables = SheetsSource.read(spark, endpoint, "fix",
          sheetNames = Some(Seq("Lookup")),
          cfg = SheetsSource.SheetsConfig(
            headers = Map("Authorization" -> "Bearer tok")))
        tables.keySet shouldBe Set("lookup")
      }
    }

    it("fails fast on bad auth (401 is not retried)") {
      withFixture { endpoint =>
        an[Exception] should be thrownBy
          SheetsSource.read(spark, endpoint, "fix")
      }
    }
  }
}

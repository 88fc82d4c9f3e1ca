package graft.sources

import java.net.URLEncoder

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

/** Google Sheets source — the Spark re-expression of the reference's
  * gspread-based dlt source (datanika
  * `services/google_sheets_source.py`: spreadsheet URL + service
  * account credentials + optional sheet names; each worksheet becomes
  * a replace-disposition table via `get_all_records()`, i.e. first
  * row = header, remaining rows = records).
  *
  * This speaks the public Sheets REST API v4 shapes directly:
  *
  *  - discovery: `GET {endpoint}/v4/spreadsheets/{id}?fields=
  *    sheets.properties.title` → worksheet titles
  *    (reference: `sheet_names=None` ⇒ all sheets);
  *  - values: `GET {endpoint}/v4/spreadsheets/{id}/values/{range}` →
  *    `{"range","majorDimension","values":[[...]]}`.
  *
  * Auth is bearer-token header passthrough (the artifact a
  * service-account OAuth flow produces) or an API-key query param —
  * the credential EXCHANGE is an auth-service concern, out of the
  * data plane, and remote endpoints are untestable here (zero
  * egress); the fixture exercises both shapes over localhost.
  *
  * Scale story: a single sheet is hard-capped by Google at 10M cells,
  * so ONE driver fetch per worksheet is the honest design (there is
  * nothing to fan out); parsing stays in Spark (`from_json` +
  * `posexplode`, codegen'd), so a 10k-sheet ingest parallelizes per
  * sheet while each body parses executor-side.
  */
object SheetsSource {

  /** Accepts a full spreadsheet URL or a bare id (reference:
    * `open_by_url` accepts both).
    */
  def spreadsheetId(urlOrId: String): String = {
    val re = "/spreadsheets/d/([A-Za-z0-9_-]+)".r
    re.findFirstMatchIn(urlOrId).map(_.group(1)).getOrElse(urlOrId)
  }

  final case class SheetsConfig(
      headers: Map[String, String] = Map.empty, // e.g. Authorization: Bearer …
      apiKey: Option[String] = None,
      maxRetries: Int = 3,
      retryBackoffMs: Long = 100L)

  private def withKey(url: String, cfg: SheetsConfig): String =
    cfg.apiKey.fold(url) { k =>
      val sep = if (url.contains("?")) "&" else "?"
      s"$url${sep}key=${URLEncoder.encode(k, "UTF-8")}"
    }

  private def get(url: String, cfg: SheetsConfig): String =
    RestSource.fetchOnce(withKey(url, cfg), cfg.headers, cfg.maxRetries,
      cfg.retryBackoffMs)

  /** Worksheet titles of a spreadsheet (the `sheet_names=None` ⇒ all
    * sheets path). Title extraction is a driver-side regex over the
    * metadata response — a spreadsheet has at most a few hundred
    * sheets.
    */
  def sheetTitles(endpoint: String, urlOrId: String,
      cfg: SheetsConfig = SheetsConfig()): Seq[String] = {
    val id = spreadsheetId(urlOrId)
    val body = get(
      s"$endpoint/v4/spreadsheets/$id?fields=sheets.properties.title", cfg)
    "\"title\"\\s*:\\s*\"([^\"]*)\"".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
  }

  /** One worksheet → DataFrame: header row names the columns
    * (snake_cased, like the reference's ingestion naming), remaining
    * rows are records. Values arrive as strings (the API's
    * FORMATTED_VALUE default); pass `schema` to type them — explicit
    * schemas are the at-scale norm (inference double-reads).
    */
  def readSheet(spark: SparkSession, endpoint: String, urlOrId: String,
      sheetName: String, cfg: SheetsConfig = SheetsConfig(),
      schema: Option[StructType] = None): DataFrame = {
    val id = spreadsheetId(urlOrId)
    val body = get(s"$endpoint/v4/spreadsheets/$id/values/" +
      URLEncoder.encode(sheetName, "UTF-8").replace("+", "%20"), cfg)
    parseValues(spark, body, schema)
  }

  /** All (or the named) worksheets as tables — the reference source's
    * full surface: `{sheet title (snake_cased) → DataFrame}`.
    */
  def read(spark: SparkSession, endpoint: String, urlOrId: String,
      sheetNames: Option[Seq[String]] = None,
      cfg: SheetsConfig = SheetsConfig(),
      schemas: Map[String, StructType] = Map.empty): Map[String, DataFrame] = {
    val names = sheetNames.getOrElse(sheetTitles(endpoint, urlOrId, cfg))
    names.map { n =>
      FileSource.toSnakeCase(n) ->
        readSheet(spark, endpoint, urlOrId, n, cfg,
          schemas.get(n).orElse(schemas.get(FileSource.toSnakeCase(n))))
    }.toMap
  }

  /** values-response body → records DataFrame. The body is already
    * driver-held (one fetch); the PARSE is Spark expressions, so a
    * many-sheet ingest keeps its per-row work executor-side.
    */
  private[sources] def parseValues(spark: SparkSession, body: String,
      schema: Option[StructType]): DataFrame = {
    val envelope = new StructType()
      .add("range", StringType)
      .add("majorDimension", StringType)
      .add("values", ArrayType(ArrayType(StringType)))
    val rows = spark.createDataset(Seq(body))(
        org.apache.spark.sql.Encoders.STRING).toDF("body")
      .select(posexplode(from_json(col("body"), envelope).getField("values"))
        .as(Seq("rn", "cells")))
    val header = rows.filter(col("rn") === 0).select("cells")
      .head().getSeq[String](0)
    require(header.nonEmpty, "sheet has no header row")
    val names = header.map(FileSource.toSnakeCase)
    val untyped = rows.filter(col("rn") > 0)
      .select(names.zipWithIndex.map { case (n, i) =>
        col("cells").getItem(i).as(n)
      }.toSeq: _*)
    schema.fold(untyped) { sc =>
      // an EMPTY cell is a null value (gspread's get_all_records
      // yields '' there); a malformed non-empty cell still fails
      // loudly under ANSI cast — silent nulling would hide data rot
      untyped.select(sc.fields.map(f =>
        nullif(col(f.name), lit("")).cast(f.dataType).as(f.name)).toSeq: _*)
    }
  }
}

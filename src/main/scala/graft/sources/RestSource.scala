package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** REST API source — the Spark re-expression of dlt's `rest_api`
  * source (reference: datanika `services/dlt_runner.py:208-289`,
  * which configures endpoint + pagination + auth and hands dlt a page
  * generator).
  *
  * Three pagination modes, with very different scale stories:
  *
  *  - `readPaged` (page-number pagination, total known up front): the
  *    page list is a `Dataset[Long]` and each EXECUTOR fetches its own
  *    page range (`mapPartitions` — imperative network IO is the one
  *    legitimate home for it). 10⁵ pages spread over 1000 executors
  *    fetch in parallel; the driver never sees a payload byte. Bodies
  *    then parse via `from_json` + `inline` — Catalyst expressions,
  *    codegen'd, so schema projection happens executor-side.
  *
  *  - `readOffset` (offset/limit pagination): same fan-out story —
  *    offsets are independent addresses, slice i pulls offset=i·limit.
  *
  *  - `readCursor` (cursor/link pagination): inherently SERIAL — each
  *    page carries the next cursor, so the walk runs on the driver,
  *    accumulating raw page bodies only (parse again stays in Spark).
  *    This matches dlt's generator semantics; APIs that need scale
  *    expose page/offset pagination precisely because cursor chains
  *    cannot fan out.
  *
  * Auth is header passthrough (`Authorization: Bearer …`, API-key
  * headers), matching the reference's `auth` config. Transient
  * failures (HTTP 5xx / connect errors) retry with linear backoff;
  * 4xx fails fast — a denied credential must not burn the retry
  * budget across 1000 executors.
  */
object RestSource {

  /** items-array envelope: `{"total": N, "items": [...]}` */
  final case class PageConfig(
      pageSize: Int = 100,
      pageParam: String = "page",
      itemsField: String = "items",
      totalField: String = "total",
      headers: Map[String, String] = Map.empty,
      maxRetries: Int = 3,
      retryBackoffMs: Long = 100L)

  private def newClient(): HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  /** GET with retry: 5xx and IO errors retry (linear backoff), 4xx
    * throws immediately. Returns the response body.
    */
  private[sources] def fetch(client: HttpClient, url: String,
      headers: Map[String, String], maxRetries: Int,
      backoffMs: Long): String = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      if (attempt > 0) Thread.sleep(backoffMs * attempt)
      try {
        val b = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofSeconds(30)).GET()
        headers.foreach { case (k, v) => b.header(k, v) }
        val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        if (code >= 200 && code < 300) return resp.body()
        else if (code >= 500)
          lastErr = new java.io.IOException(s"HTTP $code from $url")
        else
          throw new IllegalStateException(
            s"HTTP $code from $url (not retryable)")
      } catch {
        case e: java.io.IOException => lastErr = e
        case e: InterruptedException => throw e
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"GET $url failed after ${maxRetries + 1} attempts", lastErr)
  }

  /** One-off GET with the standard retry policy — driver-side
    * metadata probes (also used by SheetsSource).
    */
  private[sources] def fetchOnce(url: String, headers: Map[String, String],
      maxRetries: Int, backoffMs: Long): String =
    fetch(newClient(), url, headers, maxRetries, backoffMs)

  /** Parse raw page bodies into item rows: `from_json` against the
    * envelope schema, then `inline` explodes the items array into
    * columns — all Catalyst, so this part scales with executors
    * regardless of how the bodies were fetched.
    */
  private def parseItems(bodies: DataFrame, itemSchema: StructType,
      itemsField: String): DataFrame = {
    val envelope = new StructType()
      .add(itemsField, org.apache.spark.sql.types.ArrayType(itemSchema))
    bodies
      .select(from_json(col("body"), envelope).getField(itemsField).as("it"))
      .select(inline(col("it")))
  }

  /** Probe one URL for the item count named by `totalField`. */
  private def probeTotal(url: String, totalField: String,
      headers: Map[String, String], maxRetries: Int, backoffMs: Long): Long = {
    val first = fetchOnce(url, headers, maxRetries, backoffMs)
    val totalRe = ("\"" + java.util.regex.Pattern.quote(totalField) +
      "\"\\s*:\\s*(\\d+)").r
    totalRe.findFirstMatchIn(first)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(
        s"probe page of $url carries no '$totalField' field"))
  }

  /** Distributed fetch of `n` independently-addressable request
    * slices: the slice-id Dataset repartitions so every executor slot
    * pulls its share — this is what makes page/offset pagination the
    * scale shapes, vs the inherently serial cursor chain.
    */
  private def fanOut(spark: SparkSession, n: Long, urlFor: Long => String,
      headers: Map[String, String], maxRetries: Int,
      backoffMs: Long): Dataset[String] = {
    import spark.implicits._
    val slots = spark.sparkContext.defaultParallelism
    spark.range(n)
      .repartition(math.min(n, slots.toLong).toInt)
      .mapPartitions { slices =>
        // one client per partition — connection reuse across its slices
        val client = newClient()
        slices.map(i => fetch(client, urlFor(i), headers, maxRetries, backoffMs))
      }
  }

  /** Page-number pagination, fetched DISTRIBUTED. One driver request
    * for page 0 discovers the total; every executor slot then pulls
    * its share of the page range.
    */
  def readPaged(spark: SparkSession, baseUrl: String,
      itemSchema: StructType, cfg: PageConfig = PageConfig()): DataFrame = {
    val sep = if (baseUrl.contains("?")) "&" else "?"
    def pageUrl(p: Long) = s"$baseUrl$sep${cfg.pageParam}=$p"
    val total = probeTotal(pageUrl(0L), cfg.totalField, cfg.headers,
      cfg.maxRetries, cfg.retryBackoffMs)
    val nPages = math.max(1L, (total + cfg.pageSize - 1) / cfg.pageSize)
    val bodies = fanOut(spark, nPages, pageUrl, cfg.headers,
      cfg.maxRetries, cfg.retryBackoffMs)
    parseItems(bodies.toDF("body"), itemSchema, cfg.itemsField)
  }

  /** offset/limit envelope: `{"total": N, "items": [...]}` — the
    * third common paginator shape the reference's dlt configs pass
    * through (page-number / offset-limit / cursor, datanika
    * `services/dlt_runner.py:228-231`).
    */
  final case class OffsetConfig(
      limit: Int = 100,
      offsetParam: String = "offset",
      limitParam: String = "limit",
      itemsField: String = "items",
      totalField: String = "total",
      headers: Map[String, String] = Map.empty,
      maxRetries: Int = 3,
      retryBackoffMs: Long = 100L)

  /** Offset/limit pagination, fetched DISTRIBUTED: offsets
    * 0, limit, 2·limit, … are independent requests, so the fan-out
    * parallelizes exactly like page-number pagination (slice i pulls
    * `offset=i·limit`). One probe at offset 0 sizes the range.
    */
  def readOffset(spark: SparkSession, baseUrl: String,
      itemSchema: StructType, cfg: OffsetConfig = OffsetConfig()): DataFrame = {
    require(cfg.limit > 0, s"limit must be positive, got ${cfg.limit}")
    val sep = if (baseUrl.contains("?")) "&" else "?"
    def sliceUrl(i: Long) =
      s"$baseUrl$sep${cfg.offsetParam}=${i * cfg.limit}&${cfg.limitParam}=${cfg.limit}"
    val total = probeTotal(sliceUrl(0L), cfg.totalField, cfg.headers,
      cfg.maxRetries, cfg.retryBackoffMs)
    val nSlices = math.max(1L, (total + cfg.limit - 1) / cfg.limit)
    val bodies = fanOut(spark, nSlices, sliceUrl, cfg.headers,
      cfg.maxRetries, cfg.retryBackoffMs)
    parseItems(bodies.toDF("body"), itemSchema, cfg.itemsField)
  }

  /** cursor envelope: `{"items": [...], "next_cursor": "..."|null}` */
  final case class CursorConfig(
      cursorParam: String = "cursor",
      itemsField: String = "items",
      nextField: String = "next_cursor",
      headers: Map[String, String] = Map.empty,
      maxPages: Int = 100000,
      maxRetries: Int = 3,
      retryBackoffMs: Long = 100L)

  /** Cursor-chain pagination: serial driver walk (each page names the
    * next), accumulating raw bodies; parsing still runs in Spark.
    * `startCursor` plugs into `Incremental.saveState`-style resume.
    */
  def readCursor(spark: SparkSession, baseUrl: String,
      itemSchema: StructType, cfg: CursorConfig = CursorConfig(),
      startCursor: Option[String] = None): DataFrame = {
    import spark.implicits._
    val client = newClient()
    val sep = if (baseUrl.contains("?")) "&" else "?"
    val nextRe = ("\"" + java.util.regex.Pattern.quote(cfg.nextField) +
      "\"\\s*:\\s*\"([^\"]*)\"").r
    val bodies = Vector.newBuilder[String]
    var cursor = startCursor
    var pages = 0
    var done = false
    while (!done && pages < cfg.maxPages) {
      val url = cursor match {
        case Some(c) => s"$baseUrl$sep${cfg.cursorParam}=" +
          java.net.URLEncoder.encode(c, "UTF-8")
        case None => baseUrl
      }
      val body = fetch(client, url, cfg.headers, cfg.maxRetries,
        cfg.retryBackoffMs)
      bodies += body
      pages += 1
      cursor = nextRe.findFirstMatchIn(body).map(_.group(1))
      done = cursor.isEmpty
    }
    val all = bodies.result()
    parseItems(
      spark.createDataset(all)(org.apache.spark.sql.Encoders.STRING)
        .toDF("body"),
      itemSchema, cfg.itemsField)
  }
}

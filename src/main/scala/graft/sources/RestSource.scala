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
  * Two pagination modes, with very different scale stories:
  *
  *  - `readPaged` (page-number pagination, total known up front): the
  *    page list is a `Dataset[Long]` and each EXECUTOR fetches its own
  *    page range (`mapPartitions` — imperative network IO is the one
  *    legitimate home for it). 10⁵ pages spread over 1000 executors
  *    fetch in parallel; the driver never sees a payload byte. Bodies
  *    then parse via `from_json` + `inline` — Catalyst expressions,
  *    codegen'd, so schema projection happens executor-side.
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

  /** Page-number pagination, fetched DISTRIBUTED. One driver request
    * for page 0 discovers the total; the page-id Dataset repartitions
    * so every executor slot pulls its share.
    */
  def readPaged(spark: SparkSession, baseUrl: String,
      itemSchema: StructType, cfg: PageConfig = PageConfig()): DataFrame = {
    import spark.implicits._
    val sep = if (baseUrl.contains("?")) "&" else "?"
    def pageUrl(p: Long) = s"$baseUrl$sep${cfg.pageParam}=$p"

    // one metadata probe (page 0) sizes the fan-out
    val first = fetch(newClient(), pageUrl(0L), cfg.headers,
      cfg.maxRetries, cfg.retryBackoffMs)
    val totalRe = ("\"" + java.util.regex.Pattern.quote(cfg.totalField) +
      "\"\\s*:\\s*(\\d+)").r
    val total = totalRe.findFirstMatchIn(first)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(
        s"page 0 of $baseUrl carries no '${cfg.totalField}' field"))
    val nPages = math.max(1L, (total + cfg.pageSize - 1) / cfg.pageSize)

    val slots = spark.sparkContext.defaultParallelism
    val (headers, retries, backoff) =
      (cfg.headers, cfg.maxRetries, cfg.retryBackoffMs)
    val bodies: Dataset[String] = spark.range(nPages)
      .repartition(math.min(nPages, slots.toLong).toInt)
      .mapPartitions { pages =>
        // one client per partition — connection reuse across its pages
        val client = newClient()
        pages.map(p => fetch(client, pageUrl(p), headers, retries, backoff))
      }
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

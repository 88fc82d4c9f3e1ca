package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.types._
import graft.SparkSpec

/** RestSource against a local JDK HttpServer: page fan-out, auth
  * headers, retry on 5xx, fail-fast on 4xx, cursor chain walk.
  */
class RestSourceSpec extends SparkSpec {
  import spark.implicits._

  private val itemSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType)))

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, b.length.toLong)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private def withServer[T](handler: HttpExchange => Unit)(
      f: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api", { ex => handler(ex) })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api")
    finally server.stop(0)
  }

  private def pageOf(q: String): Int =
    q.split("&").collectFirst {
      case kv if kv.startsWith("page=") => kv.drop(5).toInt
    }.getOrElse(0)

  describe("RestSource.readPaged") {
    val rows = (0 until 23).map(i => (i, s"name-$i"))

    it("fetches every page and parses all items (ragged last page)") {
      withServer { ex =>
        val page = pageOf(Option(ex.getRequestURI.getQuery).getOrElse(""))
        val items = rows.slice(page * 5, (page + 1) * 5)
          .map { case (i, n) => s"""{"id":$i,"name":"$n"}""" }
        respond(ex, 200,
          s"""{"total":${rows.length},"items":[${items.mkString(",")}]}""")
      } { url =>
        val got = RestSource.readPaged(spark, url, itemSchema,
            RestSource.PageConfig(pageSize = 5))
          .as[(Int, String)].collect().sorted
        got shouldBe rows.sorted.toArray
      }
    }

    it("sends configured auth headers; a 401 (4xx) fails fast, not 4 retries") {
      val calls = new AtomicInteger(0)
      withServer { ex =>
        calls.incrementAndGet()
        if (Option(ex.getRequestHeaders.getFirst("X-Api-Key"))
            .contains("sekrit"))
          respond(ex, 200, """{"total":1,"items":[{"id":1,"name":"a"}]}""")
        else respond(ex, 401, """{"error":"no"}""")
      } { url =>
        RestSource.readPaged(spark, url, itemSchema,
            RestSource.PageConfig(pageSize = 5,
              headers = Map("X-Api-Key" -> "sekrit")))
          .count() shouldBe 1L
        calls.set(0)
        an[Exception] should be thrownBy {
          RestSource.readPaged(spark, url, itemSchema,
            RestSource.PageConfig(pageSize = 5))
        }
        calls.get() shouldBe 1 // fail-fast: no retry burn on denied creds
      }
    }

    it("retries transient 5xx and recovers") {
      val failures = new AtomicInteger(2) // first two calls 500
      withServer { ex =>
        if (failures.getAndDecrement() > 0) respond(ex, 500, "boom")
        else respond(ex, 200,
          """{"total":2,"items":[{"id":1,"name":"a"},{"id":2,"name":"b"}]}""")
      } { url =>
        RestSource.readPaged(spark, url, itemSchema,
            RestSource.PageConfig(pageSize = 5, retryBackoffMs = 10))
          .count() shouldBe 2L
      }
    }
  }

  describe("RestSource.readOffset") {
    val rows = (0 until 23).map(i => (i, s"name-$i"))

    def offsetHandler(seen: Option[AtomicInteger] = None)(ex: HttpExchange): Unit = {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").collect {
        case kv if kv.contains("=") =>
          val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap
      val off = params.get("offset").map(_.toInt).getOrElse(0)
      val lim = params.get("limit").map(_.toInt).getOrElse(10)
      seen.foreach(_.incrementAndGet())
      val items = rows.slice(off, off + lim)
        .map { case (i, n) => s"""{"id":$i,"name":"$n"}""" }
      respond(ex, 200,
        s"""{"total":${rows.length},"items":[${items.mkString(",")}]}""")
    }

    it("fetches every offset slice exactly once incl. the short tail") {
      val calls = new AtomicInteger(0)
      withServer(offsetHandler(Some(calls))) { url =>
        val got = RestSource.readOffset(spark, url, itemSchema,
            RestSource.OffsetConfig(limit = 5))
          .as[(Int, String)].collect().sorted
        got shouldBe rows.sorted.toArray
        // 1 probe + ceil(23/5)=5 slices — no slice doubled or dropped
        calls.get() shouldBe 6
      }
    }

    it("a limit larger than the corpus is a single slice") {
      withServer(offsetHandler()) { url =>
        RestSource.readOffset(spark, url, itemSchema,
            RestSource.OffsetConfig(limit = 1000))
          .count() shouldBe rows.length.toLong
      }
    }

    it("rejects a non-positive limit") {
      an[IllegalArgumentException] should be thrownBy
        RestSource.readOffset(spark, "http://127.0.0.1:1/api", itemSchema,
          RestSource.OffsetConfig(limit = 0))
    }
  }

  describe("RestSource.readCursor") {
    it("walks the cursor chain to exhaustion and honors startCursor") {
      val pages = Map(
        "" -> """{"items":[{"id":0,"name":"z"}],"next_cursor":"c1"}""",
        "c1" -> """{"items":[{"id":1,"name":"y"}],"next_cursor":"c2"}""",
        "c2" -> """{"items":[{"id":2,"name":"x"}]}""") // no next ⇒ stop
      withServer { ex =>
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        val cur = q.split("&").collectFirst {
          case kv if kv.startsWith("cursor=") => kv.drop(7)
        }.getOrElse("")
        respond(ex, 200, pages(cur))
      } { url =>
        RestSource.readCursor(spark, url, itemSchema,
            RestSource.CursorConfig(retryBackoffMs = 10))
          .as[(Int, String)].collect().sorted shouldBe
          Array((0, "z"), (1, "y"), (2, "x")).sorted
        // resume mid-chain: state handoff for incremental pulls
        RestSource.readCursor(spark, url, itemSchema,
            RestSource.CursorConfig(retryBackoffMs = 10),
            startCursor = Some("c2"))
          .as[(Int, String)].collect() shouldBe Array((2, "x"))
      }
    }
  }
}

package graft.ingest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** S1 live-HTTP parity: the production [[Ingest.HttpFetcher]] driven
  * through [[Ingest.fetchAllPages]]'s retry policy against a REAL
  * socket — an in-process `com.sun.net.httpserver` stub playing the
  * Wistia stats API (reference nb02:105–168). These rows are what turn
  * S1 from pass-by-trait-injection into pass-by-execution: pagination,
  * per_page/since/Authorization wire format, 429 exponential backoff,
  * 404 end-of-pages, empty-array end-of-pages, and 5xx
  * retry-then-RetriesExhausted all run over live HTTP. */
class HttpFetcherSpec extends AnyFunSuite {

  /** One-shot stub server: route → handler; auto-torn-down. */
  private def withServer[T](routes: HttpExchange => Unit)(
      body: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try routes(ex)
      finally ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1/stats")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, bodyStr: String): Unit = {
    val b = bodyStr.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
  }

  test("paginated visitors pull over live HTTP: 3 pages then empty array") {
    val seenAuth = scala.collection.mutable.ArrayBuffer[String]()
    val seenQueries = scala.collection.mutable.ArrayBuffer[String]()
    withServer { ex =>
      seenAuth += ex.getRequestHeaders.getFirst("Authorization")
      seenQueries += ex.getRequestURI.getQuery
      val page = "page=(\\d+)".r.findFirstMatchIn(
        ex.getRequestURI.getQuery).get.group(1).toInt
      if (page <= 3)
        respond(ex, 200, s"""[{"visitor_key":"v$page","load_count":$page}]""")
      else respond(ex, 200, "[]") // nb02:156 `if not visitors: break`
    } { base =>
      val f = new Ingest.HttpFetcher(base, apiToken = "tok-123")
      val pages = Ingest.fetchAllPages(f, "m1", "visitors", pageCap = 100,
        since = Some("2024-06-01"), sleep = _ => ())
      assert(pages.length == 3)
      assert(pages.head.contains("\"visitor_key\":\"v1\""))
      // wire format: bearer token on every request, page/per_page/since
      assert(seenAuth.forall(_ == "Bearer tok-123"))
      assert(seenQueries.forall(q =>
        q.contains("per_page=100") && q.contains("since=2024-06-01")))
      assert(seenQueries.map(q =>
        "page=(\\d+)".r.findFirstMatchIn(q).get.group(1)) ==
        Seq("1", "2", "3", "4"))
    }
  }

  test("media endpoint is the single-doc stats call: {base}/{id}.json") {
    val seenPaths = scala.collection.mutable.ArrayBuffer[String]()
    withServer { ex =>
      seenPaths += ex.getRequestURI.getPath
      respond(ex, 200, """{"id":"m1","name":"Launch Video","play_count":7}""")
    } { base =>
      val f = new Ingest.HttpFetcher(base, apiToken = "t")
      val docs = Ingest.fetchAllPages(f, "m1", "media", sleep = _ => ())
      // page 2 of a single-doc endpoint is end-of-pages fetcher-side —
      // exactly ONE doc and exactly ONE request hit the wire
      assert(docs.length == 1 && docs.head.contains("Launch Video"))
      assert(seenPaths.toSeq == Seq("/v1/stats/m1.json"))
    }
  }

  test("429 backoff: two throttles then success, nb02 (2^n)*5 schedule") {
    val hits = new AtomicInteger(0)
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    withServer { ex =>
      if (hits.incrementAndGet() <= 2) respond(ex, 429, "slow down")
      else respond(ex, 200, """[{"visitor_key":"v1"}]""")
    } { base =>
      val f = new Ingest.HttpFetcher(base, apiToken = "t")
      val page = Ingest.withRetry(maxRetries = 3, baseDelayMs = 5000,
        sleep = sleeps.append(_))(f.fetchPage("m1", "visitors", 1)).flatten
      assert(page.exists(_.contains("v1")) && hits.get() == 3)
      assert(sleeps.toSeq == Seq(5000L, 10000L)) // (2^attempt)*5s
    }
  }

  test("404 mid-pagination is end-of-pages, not an error") {
    withServer { ex =>
      val page = "page=(\\d+)".r.findFirstMatchIn(
        ex.getRequestURI.getQuery).get.group(1).toInt
      if (page <= 2) respond(ex, 200, s"""[{"visitor_key":"v$page"}]""")
      else respond(ex, 404, "gone")
    } { base =>
      val f = new Ingest.HttpFetcher(base, apiToken = "t")
      val pages = Ingest.fetchAllPages(f, "m1", "visitors", sleep = _ => ())
      assert(pages.length == 2)
    }
  }

  test("persistent 5xx exhausts retries and THROWS — watermark holds") {
    val hits = new AtomicInteger(0)
    withServer { ex =>
      hits.incrementAndGet(); respond(ex, 503, "boom")
    } { base =>
      val f = new Ingest.HttpFetcher(base, apiToken = "t")
      intercept[Ingest.RetriesExhausted] {
        Ingest.fetchAllPages(f, "m1", "visitors", sleep = _ => ())
      }
      // all three attempts reached the wire (the deliberate deviation
      // from nb02:120-126's silent break: transient server failure must
      // not read as end-of-pages)
      assert(hits.get() == 3)
    }
  }

  test("301 redirect is followed transparently (an API behind a " +
    "permanent redirect keeps paginating)") {
    withServer { ex =>
      val path = ex.getRequestURI.getPath
      if (!path.startsWith("/moved/")) {
        // redirect the whole API to /moved/... preserving the query
        val q = Option(ex.getRequestURI.getQuery).map("?" + _).getOrElse("")
        ex.getResponseHeaders.set("Location", s"/moved$path$q")
        respond(ex, 301, "")
      } else {
        val page = "page=(\\d+)".r.findFirstMatchIn(
          ex.getRequestURI.getQuery).get.group(1).toInt
        if (page <= 2) respond(ex, 200, s"""[{"visitor_key":"v$page"}]""")
        else respond(ex, 200, "[]")
      }
    } { base =>
      val f = new Ingest.HttpFetcher(base, apiToken = "t")
      val pages = Ingest.fetchAllPages(f, "m1", "visitors", sleep = _ => ())
      assert(pages.length == 2,
        "a followed redirect must deliver the full pagination")
    }
  }

  test("unfollowable 3xx (no Location) is retryable, NEVER " +
    "end-of-pages — exhaustion throws and the watermark holds") {
    // the silent-truncation bug class: a 3xx the client cannot follow
    // used to map to NotFound = "no more data", committing the
    // watermark past pages never seen
    val hits = new AtomicInteger(0)
    withServer { ex =>
      hits.incrementAndGet(); respond(ex, 302, "") // no Location header
    } { base =>
      val f = new Ingest.HttpFetcher(base, apiToken = "t")
      intercept[Ingest.RetriesExhausted] {
        Ingest.fetchAllPages(f, "m1", "visitors", sleep = _ => ())
      }
      assert(hits.get() == 3, "3xx must burn retries, not end pages")
    }
  }

  test("connection refused (no server) is transient, not end-of-pages") {
    // bind-then-close to get a port with nothing listening
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = server.getAddress.getPort
    server.stop(0)
    // short request timeout: some kernels park the connect instead of
    // refusing outright once the listener is gone — either way the
    // IOException must read as transient, and the test must not wait
    // out three 30 s production timeouts to prove it
    val f = new Ingest.HttpFetcher(s"http://127.0.0.1:$port/v1/stats",
      apiToken = "t", timeout = java.time.Duration.ofMillis(300))
    intercept[Ingest.RetriesExhausted] {
      Ingest.fetchAllPages(f, "m1", "visitors", sleep = _ => ())
    }
  }
}

package graft.streaming

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths, StandardCopyOption}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** S5: HTTP ingest endpoint (reference: `src/main.c:82-98,116-120` —
  * libsoup server on :8088 replying `202 Accepted`; the reference never
  * processes the body, here the accepted payload is actually durable).
  * Dependency-free: the JDK's built-in `com.sun.net.httpserver`.
  *
  * Design: the endpoint is a FRONT-DOOR, not a Spark source. Each POST
  * to `/ingest` carries NDJSON (one JSON event per line) and is spooled
  * as one atomic file into a directory that Structured Streaming's file
  * source ([[graft.sources.Sources.jsonEventStream]]) consumes: the body
  * is written to a dot-prefixed temp name (hidden files are invisible to
  * Spark's file lister), then ATOMIC_MOVE-renamed into place — the
  * rename is the commit, so a micro-batch can never list a half-written
  * batch. Exactly-once delivery downstream of the spool then rides the
  * file source's processed-files log, same as every file-stream path in
  * this engine (T1/T2).
  *
  * Auth (S11 "auth for S5"): pass `authorize` — e.g.
  * `t => Jwt.verify(t, publicKey).isDefined` — and requests without a
  * valid `Authorization: Bearer <token>` header get 401 before any
  * byte is spooled.
  *
  * Scale: one server per edge node, all spooling to shared storage, ONE
  * streaming query consuming the directory — ingest fan-in scales by
  * adding stateless spool writers, never by scaling the query. At real
  * traffic the documented production front-door is Kafka (SURVEY §2.1
  * S5); this is the reference-parity REST path for dev and small edges.
  */
object HttpIngest {

  /** Running ingest server; `port` is the bound (possibly ephemeral)
    * port. `stop()` releases the socket AND the handler pool (whose
    * non-daemon threads would otherwise pin the JVM); spooled batches
    * stay. */
  final class Server private[HttpIngest] (val port: Int, hs: HttpServer,
      pool: java.util.concurrent.ExecutorService) {
    def stop(): Unit = { hs.stop(0); pool.shutdown() }
  }

  /** Start an ingest server spooling to `spoolDir` (created if absent).
    * `port` 0 binds an ephemeral port. `authorize` gates every /ingest
    * request on its bearer token when set. */
  def start(spoolDir: String, port: Int = 0,
      authorize: Option[String => Boolean] = None): Server = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val hs = HttpServer.create(new InetSocketAddress(port), 0)
    hs.createContext("/ingest", (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "POST")
          respond(ex, 405, "method not allowed")
        else if (!authorized(ex, authorize))
          respond(ex, 401, "unauthorized")
        else {
          val body = ex.getRequestBody.readAllBytes()
          if (body.isEmpty) respond(ex, 400, "empty body")
          else {
            val name = java.util.UUID.randomUUID().toString
            val tmp = dir.resolve(s".tmp-$name")
            Files.write(tmp, body)
            Files.move(tmp, dir.resolve(s"batch-$name.json"),
              StandardCopyOption.ATOMIC_MOVE)
            // the reference's ingest-ack status (src/main.c:94)
            respond(ex, 202, "accepted")
          }
        }
      } catch {
        case e: Exception =>
          respond(ex, 500, Option(e.getMessage).getOrElse("error"))
      }
    })
    hs.createContext("/health", (ex: HttpExchange) => respond(ex, 200, "ok"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    hs.setExecutor(pool)
    hs.start()
    new Server(hs.getAddress.getPort, hs, pool)
  }

  private def authorized(ex: HttpExchange,
      authorize: Option[String => Boolean]): Boolean =
    authorize.forall { check =>
      val h = ex.getRequestHeaders.getFirst("Authorization")
      h != null && h.startsWith("Bearer ") &&
        check(h.substring("Bearer ".length))
    }

  private def respond(ex: HttpExchange, code: Int, msg: String): Unit = {
    val b = msg.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "text/plain")
    ex.sendResponseHeaders(code, b.length.toLong)
    ex.getResponseBody.write(b)
    ex.close()
  }
}

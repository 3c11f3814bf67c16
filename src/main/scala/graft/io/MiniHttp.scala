package graft.io

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback HTTP server for exercising the REAL http(s):// source path in a
  * zero-egress container (the [[MiniRedis]] pattern applied to HTTP): byte
  * content served with honest `Range` semantics (206 + Content-Range, the
  * protocol surface the reference's chunked downloader rides —
  * lib/disco/comm.py:188-205 per-chunk range requests), plus fault
  * injection — 503 bursts and truncated bodies — to prove the client's
  * retry/resume behavior, and 302 redirects to prove following.
  *
  * Test/fixture infrastructure: binds 127.0.0.1 on an ephemeral port.
  */
final class MiniHttp {
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  // daemon threads + explicit shutdown in stop(): a non-daemon default
  // pool would outlive main() and pin the whole JVM open after the last
  // query (observed: Bench hung on DestroyJavaVM with idle pool threads)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
  server.setExecutor(pool)
  server.start()

  /** Per-path request counters (assertions + fault schedules). */
  private val hits = new ConcurrentHashMap[String, AtomicInteger]()

  def port: Int = server.getAddress.getPort
  def url(path: String): String = s"http://127.0.0.1:$port$path"
  def requests(path: String): Int =
    Option(hits.get(path)).map(_.get()).getOrElse(0)

  /** Serve `content` at `path`.
    * - `failFirst`: that many initial requests answer 503 (the reference's
    *   retry-on-unavailable trigger, comm.py:74-79).
    * - `truncateNth`: the nth request (1-based) declares the full range
    *   but writes half the body and closes — a mid-stream failure the
    *   client must detect and re-pull.
    */
  def serve(path: String, content: Array[Byte], failFirst: Int = 0,
            truncateNth: Int = 0, stripContentRange: Boolean = false): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      val n = hits.computeIfAbsent(path, _ => new AtomicInteger).incrementAndGet()
      try {
        if (n <= failFirst) {
          ex.sendResponseHeaders(503, -1)
        } else {
          val range = Option(ex.getRequestHeaders.getFirst("Range"))
          val (start, endIncl, status) = range match {
            case Some(r) =>
              val m = "bytes=(\\d+)-(\\d*)".r.findFirstMatchIn(r)
                .getOrElse(throw new IllegalArgumentException(s"bad Range: $r"))
              val s0 = m.group(1).toLong
              val e0 = if (m.group(2).isEmpty) content.length - 1L
                       else math.min(m.group(2).toLong, content.length - 1L)
              (s0, e0, 206)
            case None => (0L, content.length - 1L, 200)
          }
          val len = math.max(0L, endIncl - start + 1)
          if (status == 206 && !stripContentRange)
            ex.getResponseHeaders.set("Content-Range",
              s"bytes $start-$endIncl/${content.length}")
          val writeLen = if (n == truncateNth) math.max(1L, len / 2) else len
          // declare the FULL length but write less on the truncated request:
          // the client sees a short body exactly like a dropped connection.
          // (HttpServer API: response length 0 means chunked — use -1 for
          // an honestly empty body)
          ex.sendResponseHeaders(status, if (len == 0) -1 else len)
          val os = ex.getResponseBody
          if (len > 0) os.write(content, start.toInt, writeLen.toInt)
          os.close()
        }
      } finally ex.close()
    })

  /** 302 redirect from `path` to `target` (absolute or server-relative). */
  def redirect(path: String, target: String): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      hits.computeIfAbsent(path, _ => new AtomicInteger).incrementAndGet()
      val loc = if (target.startsWith("http")) target else url(target)
      ex.getResponseHeaders.set("Location", loc)
      ex.sendResponseHeaders(302, -1)
      ex.close()
    })

  def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }
}

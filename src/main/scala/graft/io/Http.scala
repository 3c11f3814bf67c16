package graft.io

import java.io.{ByteArrayOutputStream, IOException}
import java.net.{HttpURLConnection, URI}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real HTTP(S) source semantics (reference: lib/disco/comm.py:57-117
  * `request` retry/redirect, :144-205 `Connection` chunked range reads;
  * schemes/scheme_http.py): the body is pulled as a sequence of
  * independent `Range: bytes=a-b` GETs, each retried on connection
  * failure / 503 with bounded exponential backoff — so a failure MID-BODY
  * resumes at the failed chunk's byte offset instead of re-pulling (or
  * failing) the whole URL. Redirects are followed. This is the
  * socket-level half that [[Sources.readUrls]]'s opener model abstracts
  * away; proven against a loopback [[MiniHttp]] in HttpSourceSpec
  * (zero-egress container — same-host HTTP is the testable surface).
  *
  * Scale shape: task-per-URL like every URL source here; chunk size is the
  * memory bound per task (reference default 10 MB), bytes stream through
  * the line iterator and never materialize whole.
  */
object Http {

  val DefaultChunkSize: Int = 10 * 1024 * 1024 // comm.py CHUNK_SIZE

  /** One ranged GET: returns (body, totalLength, rangeHonored). Retries
    * connection errors, short bodies, and 503 with exponential backoff
    * (comm.py retries on unavailable/socket error; other HTTP errors are
    * permanent and fail loudly). A 200 answer means the server ignored
    * Range — legal only at offset 0, where the full body is the answer.
    */
  private[graft] def fetchRange(url: String, start: Long, endIncl: Long,
                                maxRetries: Int, backoffMs: Long): (Array[Byte], Long, Boolean) = {
    var attempt = 0
    var delay = backoffMs
    while (true) {
      try return fetchOnce(url, start, endIncl)
      catch {
        case e: IOException =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def fetchOnce(url: String, start: Long, endIncl: Long): (Array[Byte], Long, Boolean) = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setInstanceFollowRedirects(true) // comm.py follows 3xx
    conn.setRequestProperty("Range", s"bytes=$start-$endIncl")
    try {
      val status = conn.getResponseCode
      if (status == 503) throw new IOException(s"$url: 503 unavailable (retryable)")
      if (status != 200 && status != 206)
        throw new IllegalStateException(s"$url: HTTP $status") // permanent
      val ranged = status == 206
      require(ranged || start == 0L,
        s"$url: server ignored Range at offset $start — cannot resume")
      // total: from Content-Range "bytes a-b/total" (206) or body length (200)
      val declared = conn.getContentLengthLong
      val total =
        if (ranged)
          Option(conn.getHeaderField("Content-Range"))
            .flatMap(cr => "/(\\d+)$".r.findFirstMatchIn(cr).map(_.group(1).toLong))
            .getOrElse(throw new IOException(s"$url: 206 without Content-Range"))
        else declared
      val in = conn.getInputStream
      val out = new ByteArrayOutputStream(
        math.min(math.max(64L, declared), 16L * 1024 * 1024).toInt)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      val body = out.toByteArray
      // short body = dropped mid-stream → retryable (the resume trigger)
      if (declared >= 0 && body.length < declared)
        throw new IOException(
          s"$url: short body ${body.length}/$declared at offset $start")
      (body, total, ranged)
    } finally conn.disconnect()
  }

  /** Sequential ranged chunks over one URL; each chunk independently
    * retried, so the stream RESUMES at the failed offset.
    */
  private[graft] def chunkIterator(url: String, chunkSize: Int,
                                   maxRetries: Int, backoffMs: Long): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var offset = 0L
      private var total = -1L
      private var done = false
      def hasNext: Boolean = !done && (total < 0 || offset < total)
      def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException
        val (body, t, ranged) =
          fetchRange(url, offset, offset + chunkSize - 1, maxRetries, backoffMs)
        if (!ranged) { done = true } // 200: full body in one answer
        else {
          total = t
          offset += body.length
          if (body.isEmpty || offset >= total) done = true
        }
        body
      }
    }

  /** UTF-8 lines out of a chunk stream — complete lines emit as chunks
    * arrive, a partial tail carries into the next chunk (the reference
    * Connection.__iter__ hold-back), the final carry emits at EOF.
    * Byte-level '\n' split is UTF-8-safe (no multibyte sequence contains
    * 0x0A).
    */
  private[graft] def lineIterator(chunks: Iterator[Array[Byte]]): Iterator[String] =
    new Iterator[String] {
      private var carry = Array.emptyByteArray
      private var pending: List[String] = Nil
      private var exhausted = false
      private def refill(): Unit =
        while (pending.isEmpty && !exhausted) {
          if (!chunks.hasNext) {
            exhausted = true
            if (carry.nonEmpty) {
              pending = List(new String(carry, "UTF-8")); carry = Array.emptyByteArray
            }
          } else {
            val data = carry ++ chunks.next()
            val lastNl = data.lastIndexOf('\n'.toByte)
            if (lastNl < 0) carry = data
            else {
              carry = java.util.Arrays.copyOfRange(data, lastNl + 1, data.length)
              pending = new String(data, 0, lastNl, "UTF-8").split("\n", -1).toList
            }
          }
        }
      def hasNext: Boolean = { refill(); pending.nonEmpty }
      def next(): String = {
        refill()
        val h = pending.head; pending = pending.tail; h
      }
    }

  /** Task-per-URL ranged line source — [[Sources.readUrls]] with the
    * reference's chunk/resume semantics. Column `line`.
    */
  def readLinesRanged(spark: SparkSession, urls: Seq[String],
                      chunkSize: Int = DefaultChunkSize, maxRetries: Int = 3,
                      backoffMs: Long = 100): DataFrame = {
    import spark.implicits._
    require(urls.nonEmpty, "http read: empty url list")
    spark.createDataset(urls).repartition(urls.size)
      .flatMap(u => lineIterator(chunkIterator(u, chunkSize, maxRetries, backoffMs)))
      .toDF("line")
  }

  /** Replica-failover ranged chunks (Disco's redundant-input contract —
    * util.py urllist replica sets — composed with the range model): when a
    * chunk exhausts its retries on the current replica, the SAME byte
    * range is pulled from the next replica and the stream continues from
    * that offset — no restart-from-zero, no duplicated bytes. Only when
    * every replica fails the same chunk does the task fail. Replicas must
    * serve identical content (the DDFS replication contract).
    */
  private[graft] def chunkIteratorReplicated(replicas: Seq[String], chunkSize: Int,
                                             maxRetries: Int, backoffMs: Long): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      require(replicas.nonEmpty, "empty replica set")
      private var offset = 0L
      private var total = -1L
      private var done = false
      private var cur = 0 // sticky: stay on a working replica
      def hasNext: Boolean = !done && (total < 0 || offset < total)
      def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException
        var lastErr: Throwable = null
        var tried = 0
        while (tried < replicas.size) {
          val url = replicas((cur + tried) % replicas.size)
          try {
            val (body, t, ranged) =
              fetchRange(url, offset, offset + chunkSize - 1, maxRetries, backoffMs)
            cur = (cur + tried) % replicas.size
            if (!ranged) { done = true }
            else {
              total = t
              offset += body.length
              if (body.isEmpty || offset >= total) done = true
            }
            return body
          } catch {
            // IOException = retries exhausted; IllegalStateException =
            // permanent HTTP error (404 on a replica missing the blob);
            // IllegalArgumentException = replica stopped honoring Range
            // mid-stream (fetchOnce's resume require) — all fail over;
            // only the full set failing kills the task
            case e @ (_: IOException | _: IllegalStateException |
                      _: IllegalArgumentException) =>
              lastErr = e; tried += 1
          }
        }
        throw new IOException(
          s"all ${replicas.size} replicas failed at offset $offset: " +
            s"${replicas.mkString(", ")}", lastErr)
      }
    }

  /** Replica-set line source: one task per replica set, ranged reads with
    * per-chunk replica failover. Column `line`.
    */
  def readLinesRangedReplicated(spark: SparkSession, replicaSets: Seq[Seq[String]],
                                chunkSize: Int = DefaultChunkSize,
                                maxRetries: Int = 1,
                                backoffMs: Long = 100): DataFrame = {
    import spark.implicits._
    require(replicaSets.nonEmpty, "http read: empty replica-set list")
    spark.createDataset(replicaSets.map(_.toList))
      .repartition(replicaSets.size)
      .flatMap(rs => lineIterator(
        chunkIteratorReplicated(rs, chunkSize, maxRetries, backoffMs)))
      .toDF("line")
  }
}

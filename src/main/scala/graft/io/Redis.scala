package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, IOException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `redis://` scheme (reference: lib/disco/schemes/scheme_redis.py:1-78).
  *
  * URL format `redis://host:port:db` — the reference's `host:port:dbid`
  * split (scheme_redis.py:12-14). The client speaks RESP (the public REdis
  * Serialization Protocol) directly over a socket, so there is no driver
  * dependency; any RESP-speaking endpoint works.
  *
  * Read model = the reference's RedisStream.read (scheme_redis.py:28-41):
  * SCAN the keyspace in cursor batches, LRANGE each key's full list, one
  * output row per (key, value). On Spark the URL list is the task list
  * (same shape as [[Sources.readUrls]]): each task streams ITS endpoint, so
  * a sharded keyspace (one URL per shard) parallelizes across the cluster
  * while a single endpoint is honestly one task — redis is a single-node
  * store; the parallelism unit is the shard, not the byte range.
  *
  * Write model = RedisStream.add / AtomicDict (scheme_redis.py:43-44,66-70):
  * push each (key, value) onto the key's list. Executed per partition with
  * one connection each; the reference's LPUSH prepends (reversing arrival
  * order), RPUSH appends — order across partitions is scheduling-dependent
  * either way, so consumers needing determinism must sort, as the oracle
  * query does.
  */
object Redis {

  private[io] def parseUrl(url: String): (String, Int, Int) = {
    val rest = url.stripPrefix("redis://")
    rest.split(":") match {
      case Array(h, p, db) => (h, p.toInt, db.toInt)
      case Array(h, p)     => (h, p.toInt, 0)
      case _ => throw new IllegalArgumentException(
        s"redis url must be redis://host:port:db — got '$url'")
    }
  }

  /** Minimal RESP client. Not thread-safe (one per task/partition). */
  private[graft] final class Client(host: String, port: Int) extends AutoCloseable {
    private val sock = new Socket(host, port)
    private val out = new BufferedOutputStream(sock.getOutputStream)
    private val in = new BufferedInputStream(sock.getInputStream)

    private def send(args: Seq[String]): Unit = {
      val sb = new StringBuilder
      sb.append('*').append(args.length).append("\r\n")
      args.foreach { a =>
        val b = a.getBytes(UTF_8)
        sb.append('$').append(b.length).append("\r\n").append(a).append("\r\n")
      }
      out.write(sb.toString.getBytes(UTF_8))
    }

    def cmd(args: String*): Any = {
      send(args)
      out.flush()
      readReply()
    }

    /** RESP pipelining: write every command, flush once, then drain the
      * replies in order — one network round-trip per batch instead of per
      * command (the standard redis bulk-load idiom).
      */
    def cmdPipeline(cmds: Iterable[Seq[String]]): Seq[Any] = {
      cmds.foreach(send)
      out.flush()
      cmds.iterator.map(_ => readReply()).toVector
    }

    private def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\r') {
        if (c == -1) throw new EOFException("redis connection closed mid-reply")
        sb.append(c.toChar)
        c = in.read()
      }
      if (in.read() != '\n') throw new IOException("malformed RESP line terminator")
      sb.toString
    }

    private def readN(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(b, off, n - off)
        if (r < 0) throw new EOFException("redis connection closed mid-bulk")
        off += r
      }
      b
    }

    private def readReply(): Any = in.read() match {
      case '+' => readLine()
      case '-' => throw new IOException("redis error: " + readLine())
      case ':' => readLine().toLong
      case '$' =>
        val n = readLine().toInt
        if (n < 0) null
        else { val b = readN(n); readLine(); new String(b, UTF_8) }
      case '*' =>
        val n = readLine().toInt
        if (n < 0) null else Vector.fill(n)(readReply())
      case -1 => throw new EOFException("redis connection closed")
      case c  => throw new IOException(s"unknown RESP type byte '${c.toChar}'")
    }

    def close(): Unit = sock.close()
  }

  /** Read every (key, value) pair from each endpoint's db — columns
    * `key`, `value`. One task per URL; SCAN batches stream lazily (the
    * keyspace is never materialized whole in the task), each batch's keys
    * are LRANGEd like the reference (scheme_redis.py:33-40).
    */
  def read(spark: SparkSession, urls: Seq[String], scanCount: Int = 100): DataFrame = {
    import spark.implicits._
    require(urls.nonEmpty, "redis read: empty endpoint list")
    require(scanCount > 0, s"redis read: SCAN COUNT must be positive, got $scanCount")
    spark.createDataset(urls).repartition(urls.size).flatMap { u =>
      val (h, p, db) = parseUrl(u)
      val c = new Client(h, p)
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; c.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      if (db != 0) c.cmd("SELECT", db.toString)
      val batches = new Iterator[Seq[String]] {
        private var cursor = "0"
        private var done = false
        def hasNext: Boolean = !done
        def next(): Seq[String] = {
          val reply = c.cmd("SCAN", cursor, "COUNT", scanCount.toString)
            .asInstanceOf[Seq[Any]]
          cursor = reply(0).asInstanceOf[String]
          if (cursor == "0") done = true
          reply(1).asInstanceOf[Seq[Any]].map(_.asInstanceOf[String])
        }
      }
      batches.flatMap { keys =>
        val kvs = keys.iterator.flatMap { k =>
          c.cmd("LRANGE", k, "0", "-1").asInstanceOf[Seq[Any]]
            .iterator.map(v => (k, v.asInstanceOf[String]))
        }
        if (batches.hasNext) kvs else kvs ++ { closeOnce(); Iterator.empty }
      }
    }.toDF("key", "value")
  }

  /** Push each row's (keyCol, valCol) onto the key's list at `url`. One
    * connection per partition. `lpush = true` reproduces the reference's
    * LPUSH (newest-first within a partition, scheme_redis.py:43-44);
    * default RPUSH preserves partition-local arrival order.
    */
  def write(df: DataFrame, url: String, keyCol: String = "key",
            valCol: String = "value", lpush: Boolean = false,
            pipelineSize: Int = 512): Unit = {
    val (h, p, db) = parseUrl(url)
    val push = if (lpush) "LPUSH" else "RPUSH"
    df.select(col(keyCol).cast("string"), col(valCol).cast("string"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val c = new Client(h, p)
        try {
          if (db != 0) c.cmd("SELECT", db.toString)
          rows.grouped(pipelineSize).foreach { batch =>
            c.cmdPipeline(batch.map { r =>
              require(!r.isNullAt(0) && !r.isNullAt(1),
                "redis write: null key or value (lists hold strings only)")
              Seq(push, r.getString(0), r.getString(1))
            })
          }
        } finally c.close()
      }
  }

  /** Keyspace size of the endpoint's db — the reference's `__len__`
    * (scheme_redis.py:21-25, DBSIZE). Driver-side, O(1) on the server.
    */
  def dbSize(url: String): Long = {
    val (h, p, db) = parseUrl(url)
    val c = new Client(h, p)
    try {
      if (db != 0) c.cmd("SELECT", db.toString)
      c.cmd("DBSIZE").asInstanceOf[Long]
    } finally c.close()
  }
}

package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, IOException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** In-process loopback RESP server implementing the command subset the
  * `redis://` scheme uses (SCAN / LRANGE / LPUSH / RPUSH / SELECT / DBSIZE /
  * FLUSHDB / PING) — the stand-in for a real redis endpoint in demos,
  * verification, and tests (this container has no redis server and no
  * egress; production points [[Redis]] at real endpoints unchanged).
  *
  * Semantics follow the public redis contract for these commands: lists
  * keyed by string, LPUSH prepends / RPUSH appends, LRANGE with inclusive
  * stop (-1 = end), SCAN returns (next-cursor, key batch) with cursor "0"
  * terminating. The cursor here is a plain index into the insertion-ordered
  * key list — a full-guarantees snapshot cursor, which is strictly stronger
  * than redis's (fine for a verification double).
  *
  * Thread-safe: one handler thread per connection (Spark writes from 32
  * partition tasks concurrently), all state guarded by a single lock —
  * loopback verification traffic, not a throughput path.
  */
final class MiniRedis extends AutoCloseable {

  private type Db = mutable.LinkedHashMap[String, mutable.ArrayBuffer[String]]
  private val dbs = mutable.Map.empty[Int, Db]
  private val lock = new Object

  private val server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
  @volatile private var running = true

  /** redis://127.0.0.1:port:db */
  def url(db: Int = 0): String =
    s"redis://127.0.0.1:${server.getLocalPort}:$db"

  private def db(id: Int): Db = dbs.getOrElseUpdate(id, mutable.LinkedHashMap.empty)

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s), "mini-redis-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: IOException => /* server closed */ }
    }
  }, "mini-redis-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    var connDb = 0

    def line(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\r') {
        if (c == -1) throw new EOFException("connection closed mid-line")
        sb.append(c.toChar)
        c = in.read()
      }
      in.read() // '\n'
      sb.toString
    }
    def bulk(): String = {
      require(in.read() == '$', "expected bulk string")
      val n = line().toInt
      val b = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(b, off, n - off)
        if (r < 0) throw new EOFException
        off += r
      }
      line() // trailing CRLF
      new String(b, UTF_8)
    }
    def readCommand(): Seq[String] = {
      val first = in.read()
      if (first == -1) throw new EOFException
      require(first == '*', s"expected RESP array, got '${first.toChar}'")
      Vector.fill(line().toInt)(bulk())
    }
    def write(s: String): Unit = out.write(s.getBytes(UTF_8))
    def replyBulk(s: String): Unit = write(s"$$${s.getBytes(UTF_8).length}\r\n$s\r\n")
    def replyArr(xs: Seq[String]): Unit = { write(s"*${xs.length}\r\n"); xs.foreach(replyBulk) }

    try {
      var open = true
      while (open && running) {
        val cmd = readCommand()
        cmd.head.toUpperCase match {
          case "PING" => write("+PONG\r\n")
          case "QUIT" => write("+OK\r\n"); open = false
          case "SELECT" => connDb = cmd(1).toInt; write("+OK\r\n")
          case "DBSIZE" =>
            val n = lock.synchronized(db(connDb).size)
            write(s":$n\r\n")
          case "FLUSHDB" =>
            lock.synchronized(db(connDb).clear())
            write("+OK\r\n")
          case "LPUSH" | "RPUSH" =>
            val n = lock.synchronized {
              val buf = db(connDb).getOrElseUpdate(cmd(1), mutable.ArrayBuffer.empty)
              if (cmd.head.equalsIgnoreCase("LPUSH")) cmd.drop(2).foreach(v => buf.insert(0, v))
              else buf ++= cmd.drop(2)
              buf.size
            }
            write(s":$n\r\n")
          case "LRANGE" =>
            val vs = lock.synchronized {
              val buf = db(connDb).getOrElse(cmd(1), mutable.ArrayBuffer.empty[String])
              val n = buf.size
              // redis contract: negative = offset from end; a stop that
              // resolves before the list start yields an EMPTY range (it
              // is not clamped to the first element)
              def resolve(i: Int) = if (i < 0) n + i else i
              val s0 = math.max(resolve(cmd(2).toInt), 0)
              val e0 = math.min(resolve(cmd(3).toInt), n - 1)
              if (e0 < s0) Vector.empty[String]
              else buf.slice(s0, e0 + 1).toVector
            }
            replyArr(vs)
          case "SCAN" if {
            val i = cmd.indexWhere(_.equalsIgnoreCase("COUNT"))
            i != -1 && cmd(i + 1).toInt <= 0
          } =>
            // real redis rejects COUNT <= 0; a silent empty terminal reply
            // would read as an empty keyspace
            write("-ERR syntax error\r\n")
          case "SCAN" =>
            val cursor = cmd(1).toInt
            val count = cmd.indexWhere(_.equalsIgnoreCase("COUNT")) match {
              case -1 => 10
              case i  => cmd(i + 1).toInt
            }
            val (next, keys) = lock.synchronized {
              val all = db(connDb).keys.toVector
              val batch = all.slice(cursor, cursor + count)
              val nc = if (cursor + count >= all.size) 0 else cursor + count
              (nc, batch)
            }
            write(s"*2\r\n")
            replyBulk(next.toString)
            replyArr(keys)
          case other =>
            write(s"-ERR unknown command '$other'\r\n")
        }
        out.flush()
      }
    } catch {
      case _: EOFException | _: IOException => // client went away
    } finally sock.close()
  }

  def close(): Unit = {
    running = false
    server.close()
  }
}

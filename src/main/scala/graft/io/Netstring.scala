package graft.io

import java.io.InputStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Disco's legacy netstring key-value format (SURVEY §2 #51; reference:
  * lib/disco/worker/task_io.py:184-249 `old_netstr_reader`): a stream of
  * alternating key/value frames, each `<decimal len> <payload>\n` where
  * `len` is the payload's byte length. Values are binary-safe (the length
  * governs, not delimiters).
  *
  * Scale note: the format has no sync markers, so a netstring file is NOT
  * splittable — one task per file, exactly Disco's per-input task model.
  * It exists for migrating legacy Disco job outputs; new data should land
  * in Parquet (splittable, columnar, self-describing).
  */
object Netstring {

  /** Read netstring files (glob ok) as a (key, value) DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (name, pds) => decodeStream(pds.open(), name) }
      .toDF("key", "value")
  }

  /** Encode (key, value) pairs to netstring bytes (the writer half, for
    * round-trips and interop tests).
    */
  def encode(pairs: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    pairs.foreach { case (k, v) =>
      Seq(k, v).foreach { s =>
        val b = s.getBytes("UTF-8")
        bos.write(s"${b.length} ".getBytes("UTF-8"))
        bos.write(b)
        bos.write('\n')
      }
    }
    bos.toByteArray
  }

  /** Streaming decoder: one (key, value) per alternating frame pair.
    * Never materializes more than one frame; closes the stream at EOF.
    */
  private[graft] def decodeStream(raw: InputStream,
                                  name: String = "<stream>"): Iterator[(String, String)] = {
    val in = new java.io.BufferedInputStream(raw)

    def readFrame(): Option[Array[Byte]] = {
      val first = in.read()
      if (first == -1) { in.close(); return None }
      require(first >= '0' && first <= '9', // a leading ' ' must not parse as len 0
        s"corrupt netstring in $name: length byte ${first.toChar} (${first})")
      var len = 0L
      var c = first
      while (c != ' ') {
        require(c >= '0' && c <= '9',
          s"corrupt netstring in $name: length byte ${c.toChar} (${c})")
        len = len * 10 + (c - '0')
        require(len <= (1L << 30), // bound BEFORE Int overflow can wrap it
          s"corrupt netstring in $name: frame length $len exceeds 1 GiB bound")
        c = in.read()
        require(c != -1, s"truncated netstring in $name: EOF inside length")
      }
      val size = len.toInt // safe: bounded to 1 GiB above
      val buf = new Array[Byte](size)
      var off = 0
      while (off < size) {
        val n = in.read(buf, off, size - off)
        require(n > 0, s"truncated netstring in $name: EOF inside payload")
        off += n
      }
      in.read() // trailing '\n' (task_io.py skips llen+1)
      Some(buf)
    }

    new Iterator[(String, String)] {
      private var pending: (String, String) = null
      private var finished = false
      private def advance(): Unit = if (!finished && pending == null) {
        readFrame() match {
          case None => finished = true
          case Some(k) =>
            val v = readFrame().getOrElse(
              throw new IllegalStateException(
                s"truncated netstring in $name: key without value"))
            pending = (new String(k, "UTF-8"), new String(v, "UTF-8"))
        }
      }
      def hasNext: Boolean = { advance(); !finished }
      def next(): (String, String) = {
        advance()
        if (finished) throw new NoSuchElementException
        val r = pending; pending = null; r
      }
    }
  }
}

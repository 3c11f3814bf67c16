package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** External program interface — Disco's external-worker protocol
  * (reference: lib/disco/worker/classic/external.py:56-170: records are
  * piped over stdin/stdout of a user binary running next to each task).
  *
  * Spark shape: `RDD.pipe` — each partition's rows stream to one process
  * instance's stdin (line-delimited), its stdout lines become the output
  * partition. Process startup amortizes per partition, data never touches
  * the driver; at 1000 executors that's 1000 concurrent local processes,
  * exactly the reference's deployment shape.
  */
object External {

  /** Pipe a single-string-column DataFrame through `command` line-by-line. */
  def pipe(spark: SparkSession, input: Dataset[String],
           command: Seq[String]): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(input.rdd.pipe(command))
  }

  /** Pipe any DataFrame: rows are tab-joined for stdin, stdout lines come
    * back as a `line` column.
    */
  def pipeRows(df: DataFrame, command: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.toDF().rdd
      .map(_.toSeq.map(v => if (v == null) "" else v.toString).mkString("\t"))
      .pipe(command)
    spark.createDataset(lines).toDF("line")
  }

  /** Binary-safe external pipe — Disco's actual wire format
    * (external.py:63-95): each record is a length-prefixed (key, value)
    * frame pair, `<u32 len><key bytes><u32 len><value bytes>`, u32s
    * little-endian like the reference's `struct.pack("I", …)`. Values may
    * contain `\n`, NUL, anything — unlike [[pipe]]'s line mode (which stays
    * the default for text tools).
    *
    * One process per partition; a daemon writer thread feeds stdin while
    * the task thread consumes stdout, so a full pipe buffer can't deadlock.
    * Non-zero exit fails the task (Spark retries it — same recovery unit
    * as a Disco task restart).
    */
  def pipeFramed(input: Dataset[(Array[Byte], Array[Byte])],
                 command: Seq[String]): Dataset[(Array[Byte], Array[Byte])] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.mapPartitions { rows =>
      import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
      val proc = new ProcessBuilder(command: _*)
        .redirectError(ProcessBuilder.Redirect.INHERIT).start()
      val out = new BufferedOutputStream(proc.getOutputStream)
      val in = new DataInputStream(new BufferedInputStream(proc.getInputStream))
      def writeFrame(b: Array[Byte]): Unit = {
        val len = java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(b.length).array()
        out.write(len); out.write(b)
      }
      // any writer failure (not just IOException: an NPE on a null value,
      // an upstream iterator error) must close stdin so the reader can't
      // hang, and must surface on the task thread instead of dying silently
      @volatile var writerError: Throwable = null
      val writer = new Thread(() => {
        try rows.foreach { case (k, v) => writeFrame(k); writeFrame(v) }
        catch {
          case _: java.io.IOException => () // process died; reader reports exit code
          case t: Throwable => writerError = t
        } finally {
          try out.close() catch { case _: java.io.IOException => () }
        }
      }, "graft-external-writer")
      writer.setDaemon(true)
      writer.start()
      def readFrame(): Array[Byte] = {
        val hdr = new Array[Byte](4)
        in.readFully(hdr)
        val len = java.nio.ByteBuffer.wrap(hdr)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
        require(len >= 0, s"corrupt frame length $len from external process")
        val buf = new Array[Byte](len)
        in.readFully(buf)
        buf
      }
      new Iterator[(Array[Byte], Array[Byte])] {
        private var pending: (Array[Byte], Array[Byte]) = null
        private var finished = false
        private def advance(): Unit = if (!finished && pending == null) {
          // EOF is clean ONLY between records: a key without its value (or
          // a truncated frame) is corrupt output even if the exit code is 0
          val key =
            try Some(readFrame())
            catch { case _: EOFException => None }
          key match {
            case Some(k) =>
              val v =
                try readFrame()
                catch {
                  case e: EOFException => throw new IllegalStateException(
                    s"external process '${command.head}' emitted a key without a value", e)
                }
              pending = (k, v)
            case None =>
              finished = true
              in.close()
              val code = proc.waitFor()
              if (writerError != null) throw writerError
              require(code == 0, s"external process '${command.head}' exited $code")
          }
        }
        def hasNext: Boolean = { advance(); !finished }
        def next(): (Array[Byte], Array[Byte]) = {
          advance()
          if (finished) throw new NoSuchElementException("external stream drained")
          val r = pending; pending = null; r
        }
      }
    }
  }
}

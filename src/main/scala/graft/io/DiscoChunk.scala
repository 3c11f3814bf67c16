package graft.io

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Disco's at-rest chunk/hunk binary format (SURVEY §1.3; reference:
  * lib/disco/worker/task_io.py:58-99 `disco_input_stream` read path,
  * lib/disco/fileutils.py:16-51,64-122 `Chunker`/`DiscoOutputStream_v1`
  * writer): the one format existing DDFS data is stored in, so a migration
  * user hits it first.
  *
  * Framing (version 1): a chunk is a sequence of hunks; each hunk is
  * `<u8 128+version><u8 is_compressed><u32le crc32><u64le size>` followed
  * by `size` bytes (zlib-deflated when is_compressed), where crc32 is over
  * the UNCOMPRESSED payload. A first byte < 128 means the whole stream is
  * the legacy netstring format (the reference reader's fallback — same
  * here, via [[Netstring]]). A zero-size hunk ends the stream.
  *
  * Records inside a hunk: the reference pickles each record — a Python
  * serialization with no cross-engine spec, so the PAYLOAD encoding here is
  * the reference's own v0 record framing instead
  * (fileutils.py:53-62 `DiscoOutputStream_v0`: `<len> <key> <len> <value>\n`,
  * binary-safe because the byte length governs, not delimiters). The hunk
  * FRAMING — the compression, checksum, and chunk-split behavior — is
  * byte-compatible with the reference.
  *
  * Scale shape: one task per chunk file (chunks are capped at `chunkSize`,
  * 64 MB by default — exactly the reference's `ddfs chunk` task model); the
  * writer emits each input partition's records as its own chunk sequence,
  * so writing is embarrassingly parallel and reading parallelism = number
  * of chunks. Migration format only — new data should land in Parquet.
  */
object DiscoChunk {

  val HunkSize: Int = 1 << 20        // 1 MB uncompressed, fileutils.py:13
  val ChunkSize: Int = 64 << 20      // 64 MB compressed, fileutils.py:14

  // ---- encode ------------------------------------------------------------

  /** Streaming chunk encoder: v0-framed records into zlib hunks, hunks into
    * bounded chunks. Yields one byte-array per chunk.
    */
  def encodeChunks(records: Iterator[(Array[Byte], Array[Byte])],
                   chunkSize: Int = ChunkSize, minHunkSize: Int = HunkSize,
                   compressionLevel: Int = 2): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      def hasNext: Boolean = records.hasNext
      def next(): Array[Byte] = {
        val out = new ByteArrayOutputStream()
        val hunk = new ByteArrayOutputStream()
        // chunk closes when its COMPRESSED size passes chunkSize
        // (fileutils.py:37-43: a hunk is only added while size < C)
        while (records.hasNext && out.size() <= chunkSize) {
          val (k, v) = records.next()
          hunk.write(s"${k.length} ".getBytes("US-ASCII")); hunk.write(k)
          hunk.write(s" ${v.length} ".getBytes("US-ASCII")); hunk.write(v)
          hunk.write('\n')
          if (hunk.size() > minHunkSize) { flushHunk(out, hunk, compressionLevel) }
        }
        if (hunk.size() > 0) flushHunk(out, hunk, compressionLevel)
        flushHunk(out, hunk, compressionLevel) // trailing empty hunk (fileutils.py:92-95 close())
        out.toByteArray
      }
    }

  private def flushHunk(out: ByteArrayOutputStream, hunk: ByteArrayOutputStream,
                        level: Int): Unit = {
    val data = hunk.toByteArray
    hunk.reset()
    val crc = new CRC32(); crc.update(data)
    val compressed = if (level > 0) deflate(data, level) else data
    val header = java.nio.ByteBuffer.allocate(14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    header.put((128 + 1).toByte)                  // version 1
    header.put(if (level > 0) 1.toByte else 0.toByte)
    header.putInt((crc.getValue & 0xFFFFFFFFL).toInt)
    header.putLong(compressed.length.toLong)
    out.write(header.array())
    out.write(compressed)
  }

  private def deflate(data: Array[Byte], level: Int): Array[Byte] = {
    val d = new Deflater(level)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(math.max(64, data.length / 4))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // ---- decode ------------------------------------------------------------

  /** Decode one chunk stream into (key, value) records. Corrupt hunks
    * (bad crc32, bad zlib) throw loudly unless `ignoreCorrupt`, which skips
    * the hunk and continues at the next header — the reference's
    * `ignore_corrupt` contract (task_io.py:84-88).
    */
  private[graft] def decodeStream(raw: InputStream, name: String = "<stream>",
                                  ignoreCorrupt: Boolean = false): Iterator[(Array[Byte], Array[Byte])] = {
    val in = new BufferedInputStream(raw)
    in.mark(1)
    val first = in.read()
    if (first == -1) { in.close(); return Iterator.empty }
    if (first < 128) { // legacy netstring fallback (task_io.py:66-69)
      in.reset()
      return Netstring.decodeStream(in, name)
        .map { case (k, v) => (k.getBytes("UTF-8"), v.getBytes("UTF-8")) }
    }
    in.reset()

    def readHunk(): Option[Array[Byte]] = {
      val b0 = in.read()
      if (b0 == -1) { in.close(); return None }
      require(b0 - 128 == 1, s"$name: unsupported chunk version ${b0 - 128}")
      val hdr = new Array[Byte](13)
      var off = 0
      while (off < 13) {
        val n = in.read(hdr, off, 13 - off)
        if (n <= 0) {
          if (ignoreCorrupt) { in.close(); return None } // truncated header
          throw new EOFException(s"$name: truncated hunk header")
        }
        off += n
      }
      val bb = java.nio.ByteBuffer.wrap(hdr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val isCompressed = bb.get() != 0
      val checksum = bb.getInt() & 0xFFFFFFFFL
      val size = bb.getLong()
      require(size >= 0 && size <= (1L << 30),
        s"$name: hunk size $size outside [0, 1 GiB]")
      if (size == 0) { in.close(); return None } // explicit end marker
      val body = new Array[Byte](size.toInt)
      off = 0
      while (off < size) {
        val n = in.read(body, off, size.toInt - off)
        if (n <= 0) {
          // a short/truncated body is a corrupt hunk too: under
          // ignoreCorrupt skip it and stop (the stream is exhausted) —
          // the reference's short-read path (task_io.py: ValueError
          // caught) — instead of aborting the whole read
          if (ignoreCorrupt) { in.close(); return None }
          throw new EOFException(s"$name: truncated hunk body")
        }
        off += n
      }
      try {
        val data = if (isCompressed) inflate(body) else body
        val crc = new CRC32(); crc.update(data)
        if ((crc.getValue & 0xFFFFFFFFL) != checksum)
          throw new IllegalStateException("checksum mismatch")
        Some(data)
      } catch {
        case e: Exception if ignoreCorrupt => Some(Array.emptyByteArray)
        case e: Exception =>
          throw new IllegalStateException(s"$name: corrupt hunk: ${e.getMessage}", e)
      }
    }

    new Iterator[(Array[Byte], Array[Byte])] {
      private var cur: Iterator[(Array[Byte], Array[Byte])] = Iterator.empty
      private var done = false
      private def advance(): Unit =
        while (!cur.hasNext && !done) readHunk() match {
          case Some(data) => cur = decodeRecords(data, name)
          case None       => done = true
        }
      def hasNext: Boolean = { advance(); cur.hasNext }
      def next(): (Array[Byte], Array[Byte]) = { advance(); cur.next() }
    }
  }

  /** v0 record frames out of one decompressed hunk: `<len> <k> <len> <v>\n`. */
  private def decodeRecords(data: Array[Byte],
                            name: String): Iterator[(Array[Byte], Array[Byte])] =
    new Iterator[(Array[Byte], Array[Byte])] {
      private var off = 0
      def hasNext: Boolean = off < data.length
      // one `<digits> <payload>` frame; the caller consumes the separator
      // byte that follows (' ' after the key, '\n' after the value)
      private def frame(): Array[Byte] = {
        var len = 0L
        while (data(off) != ' ') {
          val c = data(off)
          require(c >= '0' && c <= '9', s"$name: corrupt record length byte $c")
          len = len * 10 + (c - '0')
          require(len <= data.length, s"$name: record length $len exceeds hunk")
          off += 1
        }
        off += 1 // the ' ' ending the length
        val out = java.util.Arrays.copyOfRange(data, off, off + len.toInt)
        off += len.toInt
        out
      }
      def next(): (Array[Byte], Array[Byte]) = {
        val k = frame()
        require(data(off) == ' ', s"$name: corrupt record separator ${data(off)}")
        off += 1
        val v = frame()
        require(data(off) == '\n', s"$name: corrupt record terminator ${data(off)}")
        off += 1
        (k, v)
      }
    }

  private def inflate(body: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(body)
    val out = new ByteArrayOutputStream(body.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (!inf.finished() && inf.needsInput())
        throw new IllegalStateException("truncated zlib stream")
    }
    inf.end()
    out.toByteArray
  }

  // ---- Spark surface -----------------------------------------------------

  /** Distributed chunk sink: each input partition's records become its own
    * chunk sequence `part-<pid>-<chunk#>.chunk` under `dir`. Deterministic
    * file names make task retries idempotent (last write wins, same bytes).
    */
  def write(records: Dataset[(Array[Byte], Array[Byte])], dir: String,
            chunkSize: Int = ChunkSize, minHunkSize: Int = HunkSize,
            compressionLevel: Int = 2): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      records.sparkSession.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    val bfs = base.getFileSystem(conf.value)
    // overwrite semantics: stale chunks from a previous run with a
    // different partitioning would otherwise survive alongside the new
    // ones and duplicate records on read
    bfs.delete(base, true)
    bfs.mkdirs(base)
    records.rdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf.value)
      encodeChunks(it, chunkSize, minHunkSize, compressionLevel)
        .zipWithIndex.foreach { case (bytes, i) =>
          val p = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d-$i%05d.chunk")
          val out = fs.create(p, true)
          try out.write(bytes) finally out.close()
        }
    }
  }

  /** Read chunk files (glob ok) as a (key binary, value binary) DataFrame —
    * one task per chunk file, the reference's task model.
    */
  def read(spark: SparkSession, path: String,
           ignoreCorrupt: Boolean = false): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (name, pds) => decodeStream(pds.open(), name, ignoreCorrupt) }
      .toDF("key", "value")
  }
}

package graft

import java.io.ByteArrayInputStream

import graft.io.DiscoChunk

/** Disco chunk/hunk format: lossless round-trip (binary-safe payloads),
  * crc32 corruption detection, legacy netstring fallback, and the
  * one-file-per-chunk split behavior.
  */
class ChunkFormatSpec extends SparkTestBase {
  import spark.implicits._

  private def rt(pairs: Seq[(Array[Byte], Array[Byte])],
                 chunkSize: Int = DiscoChunk.ChunkSize,
                 minHunkSize: Int = DiscoChunk.HunkSize,
                 level: Int = 2): Seq[(Seq[Byte], Seq[Byte])] = {
    val chunks = DiscoChunk.encodeChunks(pairs.iterator, chunkSize, minHunkSize, level).toSeq
    chunks.flatMap(c =>
      DiscoChunk.decodeStream(new ByteArrayInputStream(c)).toSeq)
      .map { case (k, v) => (k.toSeq, v.toSeq) }
  }

  test("round-trip is lossless, including NUL / newline / space bytes") {
    val pairs = Seq(
      "k1".getBytes -> Array[Byte](0, 10, 13, 32, 48, -1, -128),
      "k 2\n".getBytes -> "plain value".getBytes,
      Array[Byte]() -> Array[Byte](),               // empty key AND value
      "k3".getBytes -> Array.tabulate(70000)(i => (i % 251).toByte))
    assert(rt(pairs) == pairs.map { case (k, v) => (k.toSeq, v.toSeq) })
    // uncompressed hunks too
    assert(rt(pairs, level = 0) == pairs.map { case (k, v) => (k.toSeq, v.toSeq) })
  }

  test("records split across many hunks and chunks survive") {
    val pairs = (0 until 2000).map(i =>
      s"key$i".getBytes -> s"value-$i-${"x" * (i % 97)}".getBytes)
    // tiny bounds force multi-hunk AND multi-chunk
    val chunks = DiscoChunk.encodeChunks(pairs.iterator,
      chunkSize = 8 * 1024, minHunkSize = 1024, compressionLevel = 2).toSeq
    assert(chunks.length >= 3, s"expected several chunks, got ${chunks.length}")
    val got = chunks.flatMap(c =>
      DiscoChunk.decodeStream(new ByteArrayInputStream(c)).toSeq)
      .map { case (k, v) => (new String(k), new String(v)) }
    assert(got == pairs.map { case (k, v) => (new String(k), new String(v)) })
  }

  test("corrupt hunk fails loudly; ignoreCorrupt skips it and reads on") {
    val pairs = (0 until 300).map(i => s"k$i".getBytes -> s"v$i".getBytes)
    val chunk = DiscoChunk.encodeChunks(pairs.iterator,
      minHunkSize = 256, compressionLevel = 2).next()
    // flip one byte INSIDE the first hunk body (after the 14-byte header)
    val bad = chunk.clone()
    bad(20) = (bad(20) ^ 0x5A).toByte
    val e = intercept[IllegalStateException] {
      DiscoChunk.decodeStream(new ByteArrayInputStream(bad)).toSeq
    }
    assert(e.getMessage.contains("corrupt"))
    val salvaged = DiscoChunk
      .decodeStream(new ByteArrayInputStream(bad), ignoreCorrupt = true).toSeq
    assert(salvaged.nonEmpty && salvaged.size < pairs.size,
      s"expected partial salvage, got ${salvaged.size} of ${pairs.size}")
  }

  test("hostile headers fail loudly: absurd hunk size and truncated body") {
    // header claiming a 2 GiB hunk must hit the 1 GiB bound, not allocate
    val huge = java.nio.ByteBuffer.allocate(14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    huge.put(129.toByte); huge.put(1.toByte); huge.putInt(0); huge.putLong(2L << 30)
    val e1 = intercept[IllegalArgumentException] {
      DiscoChunk.decodeStream(new ByteArrayInputStream(huge.array())).toSeq
    }
    assert(e1.getMessage.contains("1 GiB"))
    // header promising more body bytes than the stream holds → EOF error
    val short = java.nio.ByteBuffer.allocate(14 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    short.put(129.toByte); short.put(0.toByte); short.putInt(0); short.putLong(100L)
    short.put(Array[Byte](1, 2, 3, 4))
    intercept[java.io.EOFException] {
      DiscoChunk.decodeStream(new ByteArrayInputStream(short.array())).toSeq
    }
  }

  test("ignoreCorrupt salvages a stream TRUNCATED mid-hunk (short body)") {
    val pairs = (0 until 300).map(i => s"k$i".getBytes -> s"v$i".getBytes)
    val chunk = DiscoChunk.encodeChunks(pairs.iterator,
      minHunkSize = 256, compressionLevel = 2).next()
    // cut the stream 7 bytes short of the last DATA hunk's body end (walk
    // the hunk headers to find it — the chunk also carries a trailing
    // empty hunk): earlier complete hunks must decode, the truncated tail
    // must be skipped — the reference's short-read ignore_corrupt contract
    val cutAt = {
      var off = 0
      var lastBodyEnd = -1
      while (off + 14 <= chunk.length) {
        val size = java.nio.ByteBuffer.wrap(chunk, off + 6, 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
        if (size > 16) lastBodyEnd = off + 14 + size // a real data hunk
        off += 14 + size
      }
      lastBodyEnd - 7
    }
    val cut = java.util.Arrays.copyOfRange(chunk, 0, cutAt)
    val salvaged = DiscoChunk
      .decodeStream(new ByteArrayInputStream(cut), ignoreCorrupt = true).toSeq
    assert(salvaged.nonEmpty && salvaged.size < pairs.size,
      s"expected partial salvage from truncated stream, got ${salvaged.size}")
    // without the flag it still fails loudly
    intercept[java.io.EOFException] {
      DiscoChunk.decodeStream(new ByteArrayInputStream(cut)).toSeq
    }
  }

  test("legacy netstring stream decodes via the <128 first-byte fallback") {
    val ns = graft.io.Netstring.encode(Seq("a" -> "1", "b" -> "two"))
    val got = DiscoChunk.decodeStream(new ByteArrayInputStream(ns)).toSeq
      .map { case (k, v) => (new String(k), new String(v)) }
    assert(got == Seq("a" -> "1", "b" -> "two"))
  }

  test("distributed write/read round-trips through chunk files") {
    val dir = graft.io.IoScratch.dir + "/chunk_spec"
    val pairs = (0 until 500).map(i => (s"id$i", s"text $i \n with newline"))
    val ds = spark.createDataset(pairs)
      .repartition(4)
      .map { case (k, v) => (k.getBytes("UTF-8"), v.getBytes("UTF-8")) }
    DiscoChunk.write(ds, dir, chunkSize = 512, minHunkSize = 128)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".chunk"))
    assert(files.length > 4, s"expected >1 chunk per partition, got ${files.length}")
    val got = DiscoChunk.read(spark, dir + "/*.chunk")
      .as[(Array[Byte], Array[Byte])]
      .map { case (k, v) => (new String(k, "UTF-8"), new String(v, "UTF-8")) }
      .collect().sortBy(r => r._1)
    assert(got.toSeq == pairs.sortBy(_._1))
  }
}

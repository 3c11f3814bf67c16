package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque bytes + typed metadata. The 100 TB contract:
  * payloads live in a `binary` column (parquet keeps them compressed and
  * column-pruned away unless selected); metadata is a narrow string map that
  * survives predicate pushdown, so "all jpegs wider than X" never reads a
  * byte of payload.
  */
case class MediaRecord(id: Long, mediaType: String, payload: Array[Byte],
                       meta: Map[String, String])

/** Decoded-image stand-in (dims + pixel checksum). */
case class DecodedMeta(id: Long, width: Int, height: Int, checksum: Long)

/** Per-record derived features: byte histogram + unit feature vector. */
case class MediaFeatures(id: Long, nBytes: Long, hist: Array[Long],
                         feature: Array[Float])

/** One content-defined chunk of a payload. */
case class Chunk(id: Long, idx: Int, offset: Long, nBytes: Int, fp: String)

/** Multimodal column operators — the builder-brief surface: treat
  * image/audio/video as opaque binary columns; decode / feature-extract /
  * resize / frame-sample run batched per partition (`mapPartitions` — the
  * Scala analog of `mapInPandas`: one iterator per batch, amortized setup,
  * executor-local).
  *
  * The fixtures carry no real media bytes, so [[Codec.decode]] is a
  * clearly-marked STUB with a deterministic fake; everything Spark-side —
  * schema, Encoders, batch iteration, partitioning, pruning — is real and
  * oracle-tested (q_media_stats, q_media_hist).
  */
object Multimodal {

  /** Media codecs. Real decoders need native libraries that are not in this
    * container — every function here is a STUB whose *shape* (signature,
    * determinism, batch amortization) is the real contract.
    */
  object Codec {
    /** STUB image decode: dims/checksum derived deterministically from the
      * bytes (a real build would link an image codec here).
      */
    def decode(id: Long, payload: Array[Byte]): DecodedMeta = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
      DecodedMeta(id, 16 + math.floorMod(sum, 640).toInt,
        16 + math.floorMod(sum >> 16, 480).toInt, sum)
    }

    /** STUB resize: a real implementation transforms pixels; the metadata
      * contract (dims rescaled, payload untouched as opaque bytes) is real.
      */
    def resizeMeta(m: DecodedMeta, maxDim: Int): DecodedMeta = {
      val scale = math.min(1.0, maxDim.toDouble / math.max(m.width, m.height))
      m.copy(width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt))
    }

    /** STUB frame sampling: every `stride`-th fixed-size slice of the
      * payload stands in for a video frame.
      */
    def frameSample(payload: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
      payload.grouped(frameSize).zipWithIndex
        .collect { case (f, i) if i % stride == 0 => f }.toSeq
  }

  /** Wrap a table into the media schema, payload = UTF-8 bytes of `srcCol`
    * (deterministic stand-in for stored image/audio bytes).
    */
  def asMedia(df: DataFrame, idCol: String, srcCol: String,
              mediaType: String = "text/plain"): DataFrame =
    df.select(col(idCol).cast("long").as("id"), lit(mediaType).as("media_type"),
      to_binary(col(srcCol), lit("utf-8")).as("payload"),
      map(lit("src_col"), lit(srcCol)).as("meta"))

  /** Payload stats as pure Column ops (no decode): byte length + md5 — the
    * dedupe/integrity pass that must not require decoding at 100 TB.
    */
  def payloadStats(media: DataFrame): DataFrame =
    media.select(col("id"), col("media_type"),
      length(col("payload")).as("n_bytes"), md5(col("payload")).as("fp"))

  /** Batched feature extraction over the opaque payload: 4-bin byte
    * histogram (by top-2 bits) + an L1-normalized float feature. One tight
    * loop per partition — the mapInPandas batch shape.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Long](4)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) >> 6) += 1; i += 1 }
          val n = math.max(1L, bytes.length.toLong)
          MediaFeatures(id, bytes.length.toLong, hist,
            hist.map(h => h.toFloat / n))
        }
      }
  }

  /** Batched decode over payloads (STUB codec, real plumbing). */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => Codec.decode(id, bytes) })
  }

  /** Content-defined chunking over opaque payloads — Rabin-style rolling
    * hash: a chunk boundary falls wherever the hash of the trailing
    * `window` bytes is 0 mod 2^maskBits, so expected chunk size ≈
    * 2^maskBits bytes and boundaries are SHIFT-RESISTANT: an insertion
    * near the front re-synchronizes within one chunk instead of moving
    * every later boundary (what fixed-size splitting does). Cross-file
    * segment dedup is then one groupBy(fp) — the byte-level near-dup pass
    * that needs no codec and works on any modality.
    *
    * The reference packed fixed 64 MB chunks at ingest
    * (lib/disco/fileutils.py:16-51 `Chunker`); CDC is that operation made
    * dedup-friendly. min/max bound chunk sizes (min skips degenerate
    * boundaries, max forces progress on boundary-free data).
    */
  def cdcChunks(spark: SparkSession, media: DataFrame, maskBits: Int = 10,
                window: Int = 16, minChunk: Int = 256,
                maxChunk: Int = 4096): Dataset[Chunk] = {
    import spark.implicits._
    // maskBits < 31: (1 << 32) wraps to 1 → mask 0 → EVERY position is a
    // boundary (silent fixed-size splitting, the opposite of CDC).
    // minChunk >= window: boundary decisions must depend only on the
    // trailing window, or shift-resistance quietly breaks.
    require(maskBits > 0 && maskBits < 31,
      s"maskBits must be in [1, 30], got $maskBits")
    require(window > 0 && minChunk >= window && minChunk <= maxChunk,
      s"need 0 < window <= minChunk <= maxChunk, got window=$window minChunk=$minChunk maxChunk=$maxChunk")
    val mask = (1 << maskBits) - 1
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        // polynomial rolling hash base: an ODD multiplier (FNV prime), so
        // B^window mod 2^32 never collapses to 0 (base 256 would: 256^4 ≡
        // 0 mod 2^32, silently shrinking the window to 4 bytes). Int
        // wraparound IS the modulus — deterministic everywhere.
        val B = 16777619
        val drop = {
          var p = 1; var i = 0
          while (i < window) { p *= B; i += 1 }
          p
        }
        it.flatMap { case (id, bytes) =>
          val out = Vector.newBuilder[Chunk]
          var start = 0
          var h = 0
          var idx = 0
          var i = 0
          while (i < bytes.length) {
            val in = bytes(i) & 0xff
            h = h * B + in
            if (i - start >= window) h -= drop * (bytes(i - window) & 0xff)
            val len = i - start + 1
            if ((len >= minChunk && (h & mask) == 0) || len >= maxChunk ||
                i == bytes.length - 1) {
              md.update(bytes, start, len) // hash the slice in place, no copy
              val fp = md.digest().map("%02x".format(_)).mkString
              out += Chunk(id, idx, start.toLong, len, fp)
              idx += 1; start = i + 1; h = 0
            }
            i += 1
          }
          out.result()
        }
      }
  }
}

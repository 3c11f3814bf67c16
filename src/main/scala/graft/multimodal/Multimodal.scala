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

/** Parsed container metadata for one payload; dims null when the payload
  * is not a recognizable image (format = "unknown").
  */
case class ImageDims(id: Long, format: String,
                     width: Option[Int], height: Option[Int])

/** Parsed audio-container metadata; fields null when the payload is not a
  * recognizable audio file (format = "unknown").
  */
case class AudioDims(id: Long, format: String, channels: Option[Int],
                     sampleRate: Option[Int], bits: Option[Int],
                     nFrames: Option[Long], durationMs: Option[Long])

/** Per-record derived features: byte histogram + unit feature vector. */
case class MediaFeatures(id: Long, nBytes: Long, hist: Array[Long],
                         feature: Array[Float])

/** One content-defined chunk of a payload. */
case class Chunk(id: Long, idx: Int, offset: Long, nBytes: Int, fp: String)

/** Pixel-decoded per-image stats: luminance histogram (4 bins by the top 2
  * bits) + exact integer luminance sum. Null fields when the payload is not
  * pixel-decodable.
  */
case class DecodedStats(id: Long, format: String, width: Option[Int],
                        height: Option[Int], nPx: Option[Long],
                        lumSum: Option[Long], l0: Option[Long],
                        l1: Option[Long], l2: Option[Long], l3: Option[Long])

/** Multimodal column operators — the builder-brief surface: treat
  * image/audio/video as opaque binary columns; decode / feature-extract /
  * resize / frame-sample run batched per partition (`mapPartitions` — the
  * Scala analog of `mapInPandas`: one iterator per batch, amortized setup,
  * executor-local).
  *
  * Container METADATA extraction is real byte-level parsing
  * ([[ImageMeta]]: PNG/GIF/BMP headers, JPEG marker scan — public format
  * specs, no native decoders); only PIXEL decode remains a clearly-marked
  * stand-in (real pixel codecs need native libraries absent from this
  * container). Everything Spark-side — schema, Encoders, batch iteration,
  * partitioning, pruning — is real and oracle-tested (q_media_stats,
  * q_media_hist, q_media_dims).
  */
object Multimodal {

  /** Media codecs: real container-header parsing via [[ImageMeta]]; the
    * PIXEL-level paths (resize, frame extraction) are STUBs whose *shape*
    * (signature, determinism, batch amortization) is the real contract.
    */
  object Codec {
    /** Image decode: dims from the REAL container header when the payload
      * is a recognizable PNG/GIF/BMP/JPEG; otherwise a deterministic fake
      * (the non-image fixture path). Checksum is a payload byte fold either
      * way — the pixel-level stand-in.
      */
    def decode(id: Long, payload: Array[Byte]): DecodedMeta = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
      ImageMeta.sniff(payload) match {
        case Some(info) => DecodedMeta(id, info.width, info.height, sum)
        case None =>
          DecodedMeta(id, 16 + math.floorMod(sum, 640).toInt,
            16 + math.floorMod(sum >> 16, 480).toInt, sum)
      }
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

  /** Batched decode over payloads (real header parsing via [[ImageMeta]],
    * pixel checksum stand-in).
    */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => Codec.decode(id, bytes) })
  }

  /** Synthetic image corpus over any table: one spec-correct minimal
    * PNG/GIF/BMP/JPEG per row (format and dimensions are deterministic
    * functions of the id; `textCol` bytes become the opaque payload
    * filler). The fixture tables carry no real media, so this is how the
    * parse path gets exercised end-to-end: build real container bytes,
    * then extract dims back out of the binary column.
    */
  def syntheticImages(spark: SparkSession, df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val w = (16 + math.floorMod(id * 37, 2000)).toInt
        val h = (16 + math.floorMod(id * 53, 1500)).toInt
        val filler = Option(text).getOrElse("").getBytes("UTF-8").take(200)
        val (mt, payload) = math.floorMod(id, 4) match {
          case 0 => ("image/png", ImageMeta.makePng(w, h, filler))
          case 1 => ("image/gif", ImageMeta.makeGif(w, h, filler))
          case 2 => ("image/bmp", ImageMeta.makeBmp(w, h, filler))
          case _ => ("image/jpeg", ImageMeta.makeJpeg(w, h, filler))
        }
        MediaRecord(id, mt, payload, Map("synthetic" -> "true"))
      })
      .toDF("id", "media_type", "payload", "meta")
  }

  /** Batched dimension extraction over the binary column — the real
    * [[ImageMeta.sniff]] parse, one tight loop per partition, no shuffle;
    * unparseable payloads yield format "unknown" with null dims (garbage
    * in a crawl batch must not kill the task).
    */
  def imageDims(spark: SparkSession, media: DataFrame): Dataset[ImageDims] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ImageMeta.sniff(bytes) match {
          case Some(i) => ImageDims(id, i.format, Some(i.width), Some(i.height))
          case None    => ImageDims(id, "unknown", None, None)
        }
      })
  }

  /** Pixel value formulas for [[syntheticPixelImages]] — deterministic
    * integer functions of (id, x, y) so a SQL oracle can replay the decoded
    * stats without a decoder. Small dims (≤ 32×26) keep per-row payloads a
    * few KB: the point is exercising the real decode path, not volume.
    */
  object PixelFormula {
    def width(id: Long): Int  = (4 + math.floorMod(id, 29)).toInt
    def height(id: Long): Int = (4 + math.floorMod(id, 23)).toInt
    def r(id: Long, x: Int, y: Int): Int = math.floorMod(id * 3 + x * 7 + y * 11, 256).toInt
    def g(id: Long, x: Int, y: Int): Int = math.floorMod(id * 5 + x * 13 + y * 17, 256).toInt
    def b(id: Long, x: Int, y: Int): Int = math.floorMod(id * 7 + x * 19 + y * 23, 256).toInt
    /** BT.601 integer luminance — exact in any engine: (299r+587g+114b)/1000. */
    def lum(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000
    def rgbBytes(id: Long): Array[Byte] = {
      val w = width(id); val h = height(id)
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = (y * w + x) * 3
          out(p) = r(id, x, y).toByte
          out(p + 1) = g(id, x, y).toByte
          out(p + 2) = b(id, x, y).toByte
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Synthetic corpus with REAL pixel content: BMP (even ids) / PNG (odd
    * ids), pixels from [[PixelFormula]]. PNG rows cycle filter types
    * 0/1/2 by (id+row), so decode exercises de-filtering, not just the
    * filter-0 identity (Average/Paeth are pinned by golden-byte specs).
    */
  def syntheticPixelImages(spark: SparkSession, df: DataFrame,
                           idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val w = PixelFormula.width(id); val h = PixelFormula.height(id)
        val rgb = PixelFormula.rgbBytes(id)
        val (mt, payload) =
          if (math.floorMod(id, 2) == 0L)
            ("image/bmp", PixelCodec.makeBmp24(w, h, rgb))
          else
            ("image/png", PixelCodec.makePng24(w, h, rgb,
              y => math.floorMod(id + y, 3).toInt))
        MediaRecord(id, mt, payload, Map("synthetic" -> "true"))
      })
      .toDF("id", "media_type", "payload", "meta")
  }

  /** Pixel-DECODED stats over the binary column — the real
    * [[PixelCodec.decode]] per payload (BMP pixel-array walk, PNG
    * inflate + de-filter), then an integer luminance fold: 4-bin histogram
    * by the top 2 luminance bits + exact lum sum. One tight loop per
    * partition, no shuffle; undecodable payloads yield format "unknown"
    * with null stats (crawl garbage must not kill the task).
    */
  def decodedStats(spark: SparkSession, media: DataFrame): Dataset[DecodedStats] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        PixelCodec.decode(bytes) match {
          case Some(img) =>
            val hist = new Array[Long](4)
            var lumSum = 0L
            var i = 0
            while (i < img.rgb.length) {
              val lum = PixelFormula.lum(img.rgb(i) & 0xff,
                img.rgb(i + 1) & 0xff, img.rgb(i + 2) & 0xff)
              hist(lum >> 6) += 1
              lumSum += lum
              i += 3
            }
            DecodedStats(id, img.format, Some(img.width), Some(img.height),
              Some(img.width.toLong * img.height), Some(lumSum),
              Some(hist(0)), Some(hist(1)), Some(hist(2)), Some(hist(3)))
          case None =>
            DecodedStats(id, "unknown", None, None, None, None,
              None, None, None, None)
        }
      })
  }

  /** Synthetic audio corpus, same pattern as [[syntheticImages]]: one
    * spec-correct minimal WAV or AIFF per row, all parameters
    * deterministic functions of the id (the arithmetic the oracle
    * replays); `textCol` bytes ride along as the variable-length JUNK/ANNO
    * chunk the parser must walk past.
    */
  def syntheticAudio(spark: SparkSession, df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    import spark.implicits._
    val rates = Array(8000, 16000, 22050, 44100)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val channels = 1 + math.floorMod(id * 17, 2).toInt
        val rate = rates(math.floorMod(id * 31, 4).toInt)
        val bits = 8 + 8 * math.floorMod(id * 13, 2).toInt
        val nFrames = (100 + math.floorMod(id * 29, 2000)).toInt
        val filler = Option(text).getOrElse("").getBytes("UTF-8").take(120)
        val (mt, payload) =
          if (math.floorMod(id, 2) == 0L)
            ("audio/wav", AudioMeta.makeWav(channels, rate, bits, nFrames, filler))
          else
            ("audio/aiff", AudioMeta.makeAiff(channels, rate, bits, nFrames, filler))
        MediaRecord(id, mt, payload, Map("synthetic" -> "true"))
      })
      .toDF("id", "media_type", "payload", "meta")
  }

  /** Batched audio-metadata extraction over the binary column — the real
    * [[AudioMeta.sniff]] chunk walk per partition, no shuffle; garbage
    * yields format "unknown" with null fields. duration_ms is integer
    * arithmetic (frames·1000 div rate) — no float time math.
    */
  def audioDims(spark: SparkSession, media: DataFrame): Dataset[AudioDims] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        AudioMeta.sniff(bytes) match {
          case Some(a) => AudioDims(id, a.format, Some(a.channels),
            Some(a.sampleRate), Some(a.bitsPerSample), Some(a.nFrames),
            Some(a.nFrames * 1000L / a.sampleRate))
          case None => AudioDims(id, "unknown", None, None, None, None, None)
        }
      })
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

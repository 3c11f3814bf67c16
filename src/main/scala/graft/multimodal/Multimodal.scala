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
    /** Dup-planting id map: ids ≡ 4 (mod 5) are perturbed variants of id−4. */
    def baseOf(id: Long): Long = if (math.floorMod(id, 5) == 4L) id - 4 else id
    def isPerturbed(id: Long, x: Int, y: Int): Boolean =
      math.floorMod(id, 5) == 4L && math.floorMod(x + y + baseOf(id), 17) == 0L
    /** Variant pixels: base image's channels +6 (capped 255) on perturbed
      * coordinates — small enough that variants stay hash-near the base.
      */
    def rgbBytesDup(id: Long): Array[Byte] = {
      val base = baseOf(id)
      val w = width(base); val h = height(base)
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = (y * w + x) * 3
          val d = if (isPerturbed(id, x, y)) 6 else 0
          out(p) = math.min(255, r(base, x, y) + d).toByte
          out(p + 1) = math.min(255, g(base, x, y) + d).toByte
          out(p + 2) = math.min(255, b(base, x, y) + d).toByte
          x += 1
        }
        y += 1
      }
      out
    }
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
    *
    * `withDups = true` plants NEAR-DUPLICATES: every id ≡ 4 (mod 5)
    * renders the pixels of id−4 with a small deterministic perturbation
    * (channels +6, capped, on the ~1/17 of pixels where
    * (x + y + baseId) % 17 == 0) — the structure [[imageNearDupPairs]]
    * exists to find, and (like everything here) pure id arithmetic an
    * oracle replays.
    */
  def syntheticPixelImages(spark: SparkSession, df: DataFrame,
                           idCol: String, withDups: Boolean = false): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val base = if (withDups) PixelFormula.baseOf(id) else id
        val w = PixelFormula.width(base); val h = PixelFormula.height(base)
        val rgb =
          if (withDups) PixelFormula.rgbBytesDup(id)
          else PixelFormula.rgbBytes(id)
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

  /** Gray GIF corpus: one 256-gray-palette GIF87a per doc, pixel value =
    * [[PixelFormula.r]] — palette-indexed so GIF's 256-color constraint
    * is honestly representable (a full-RGB formula image can exceed the
    * palette); gray entries are (v,v,v) so BT.601 luminance IS v and the
    * arithmetic oracle replays the decoded stats without touching a
    * byte. Decoding must walk header, palette, sub-blocks, and the real
    * LZW stream ([[PixelCodec.decodeGif]]).
    */
  def syntheticGifImages(spark: SparkSession, df: DataFrame,
                         idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val w = PixelFormula.width(id); val h = PixelFormula.height(id)
        val gray = Array.tabulate(w * h)(p =>
          PixelFormula.r(id, p % w, p / w).toByte)
        MediaRecord(id, "image/gif", PixelCodec.makeGif8(w, h, gray),
          Map("synthetic" -> "true"))
      })
      .toDF("id", "media_type", "payload", "meta")
  }

  /** Block/MCU value formulas for [[syntheticJpegImages]] — like
    * [[PixelFormula]] but at JPEG's 8×8-block grain: every block is
    * uniform (DC-only encoding), so the decode is integer-exact under any
    * conforming IDCT and a SQL oracle replays pixels from pure id
    * arithmetic. Even ids are grayscale, odd ids 4:2:0 color with chroma
    * constant per 16×16 MCU; ids ≡ 0 (mod 3) carry a restart interval so
    * RSTn resync is exercised in the corpus, not just specs.
    */
  object JpegFormula {
    def width(id: Long): Int  = (8 + math.floorMod(id, 21)).toInt
    def height(id: Long): Int = (8 + math.floorMod(id, 17)).toInt
    def gray(id: Long)(bx: Int, by: Int): Int =
      math.floorMod(id * 5 + bx * 11 + by * 19, 256).toInt
    def yv(id: Long)(bx: Int, by: Int): Int =
      math.floorMod(id * 3 + bx * 7 + by * 13, 256).toInt
    def cb(id: Long)(mx: Int, my: Int): Int =
      math.floorMod(id * 5 + mx * 17 + my * 23, 256).toInt
    def cr(id: Long)(mx: Int, my: Int): Int =
      math.floorMod(id * 7 + mx * 29 + my * 31, 256).toInt
    def restart(id: Long): Int = if (math.floorMod(id, 3) == 0L) 2 else 0
  }

  /** Synthetic baseline-JPEG corpus with REAL entropy-coded content:
    * grayscale (even ids) / 4:2:0 YCbCr (odd ids) DC-only frames from
    * [[JpegFormula]], restart markers on every third id. Decoding walks
    * the full T.81 path — marker segments, DHT Huffman build, entropy
    * decode with unstuffing and RSTn resync, dequant, IDCT, upsample,
    * fixed-point color transform ([[JpegCodec]]).
    */
  def syntheticJpegImages(spark: SparkSession, df: DataFrame,
                          idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val w = JpegFormula.width(id)
        val h = JpegFormula.height(id)
        val payload =
          if (math.floorMod(id, 2) == 0L)
            JpegCodec.makeJpegGray(w, h, JpegFormula.gray(id),
              JpegFormula.restart(id))
          else
            JpegCodec.makeJpeg420(w, h, JpegFormula.yv(id),
              JpegFormula.cb(id), JpegFormula.cr(id), JpegFormula.restart(id))
        MediaRecord(id, "image/jpeg", payload, Map("synthetic" -> "true"))
      })
      .toDF("id", "media_type", "payload", "meta")
  }

  /** Decode → per-image RGB channel sums + integer BT.601 luminance sum —
    * the channel-level companion to [[decodedStats]] (whose histogram is
    * luminance-only): r/g/b sums pin the COLOR path (chroma upsample +
    * YCbCr→RGB), which a gray-only fold can't distinguish from a
    * luma-correct/chroma-wrong decode. Undecodable payloads are dropped.
    */
  def decodedRgbStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        PixelCodec.decode(bytes).map { img =>
          var rSum = 0L; var gSum = 0L; var bSum = 0L; var lumSum = 0L
          var i = 0
          while (i < img.rgb.length) {
            val r = img.rgb(i) & 0xff
            val g = img.rgb(i + 1) & 0xff
            val b = img.rgb(i + 2) & 0xff
            rSum += r; gSum += g; bSum += b
            lumSum += PixelFormula.lum(r, g, b)
            i += 3
          }
          (id, img.format, img.width.toLong, img.height.toLong,
            img.width.toLong * img.height, lumSum, rSum, gSum, bSum)
        }
      })
      .toDF("id", "format", "width", "height", "n_px", "lum_sum",
        "r_sum", "g_sum", "b_sum")
  }

  /** Decode → REAL nearest-neighbor resize (bounded box, never upscale) →
    * integer luminance stats of the RESIZED raster — the thumbnail
    * pipeline end-to-end, replacing the old metadata-only resize stub.
    * All integer arithmetic, so a SQL oracle replays the sampling rule
    * exactly. Undecodable payloads are dropped.
    */
  def resizedStats(spark: SparkSession, media: DataFrame,
                   maxDim: Int): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        PixelCodec.decode(bytes).map { img =>
          val r = PixelCodec.resizeToMax(img, maxDim)
          var lumSum = 0L
          var i = 0
          while (i < r.rgb.length) {
            lumSum += PixelFormula.lum(r.rgb(i) & 0xff, r.rgb(i + 1) & 0xff,
              r.rgb(i + 2) & 0xff)
            i += 3
          }
          (id, r.width.toLong, r.height.toLong,
            r.width.toLong * r.height, lumSum)
        }
      })
      .toDF("id", "rw", "rh", "n_px", "lum_sum")
  }

  /** 8×8 average-hash of decoded pixels as four 16-bit bands — the
    * image-near-dup fingerprint: nearest-neighbor-sample a 64-point grid
    * (integer index arithmetic, [[PixelCodec.resizeNearest]]'s sampling
    * rule), integer BT.601 luminance per point, threshold against the
    * integer mean. Band k holds bits [16k, 16k+16). Kept as four ints —
    * not one 64-bit word — so band-bucket joins and per-band hamming are
    * sign-free and engine-portable.
    */
  def aHashBands(img: PixelImage): Array[Int] = {
    val l = new Array[Int](64)
    var sum = 0
    var j = 0
    while (j < 8) {
      val sy = j * img.height / 8
      var i = 0
      while (i < 8) {
        val sx = i * img.width / 8
        val lum = PixelFormula.lum(img.r(sx, sy), img.g(sx, sy), img.b(sx, sy))
        l(j * 8 + i) = lum; sum += lum
        i += 1
      }
      j += 1
    }
    val mean = sum / 64
    val bands = new Array[Int](4)
    var k = 0
    while (k < 64) {
      if (l(k) > mean) bands(k / 16) |= 1 << (k % 16)
      k += 1
    }
    bands
  }

  /** Decoded average-hash per payload: (id, b0..b3); undecodable payloads
    * are dropped (a fingerprint of garbage is noise, not signal).
    */
  def imageHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        PixelCodec.decode(bytes).map { img =>
          val b = aHashBands(img)
          (id, b(0), b(1), b(2), b(3))
        }
      })
      .toDF("id", "b0", "b1", "b2", "b3")
  }

  /** IMAGE near-duplicate pairs by average-hash hamming distance — the
    * visual leg of the dedup suite (same architecture as SimHash text
    * dedup): candidates from 16-bit band-bucket equi-joins (pigeonhole:
    * hamming ≤ 3 over 4 bands ⇒ at least one band matches exactly, so
    * recall is GUARANTEED at the default radius, heuristic beyond), then
    * exact hamming (xor + bit_count, codegen'd) verifies. Never all-pairs:
    * candidate volume is Σ bucket²  over hash-bucket sizes, and a
    * structured corpus that collapses buckets degrades gracefully into
    * the verify filter.
    */
  def imageNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"band recall guarantee (4 bands) holds for hamming <= 3, got $maxHamming")
    val hashes = imageHashes(spark, media)
    val bandCols = Seq("b0", "b1", "b2", "b3")
    val exploded = hashes.select(col("id") +: bandCols.map(col) :+
      explode(array(bandCols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("band"), col(c).as("bv"))
      }: _*)).as("bb"): _*)
      .select(col("id") +: bandCols.map(col) :+
        col("bb.band").as("band") :+ col("bb.bv").as("bv"): _*)
    val x = exploded.select(
      col("id").as("xid") +: col("band").as("xband") +: col("bv").as("xbv") +:
        bandCols.map(c => col(c).as(s"x$c")): _*)
    val y = exploded.select(
      col("id").as("yid") +: col("band").as("yband") +: col("bv").as("ybv") +:
        bandCols.map(c => col(c).as(s"y$c")): _*)
    val ham = bandCols.map(c =>
      bit_count(col(s"x$c").bitwiseXOR(col(s"y$c")))).reduce(_ + _)
    x.join(y, col("xband") === col("yband") && col("xbv") === col("ybv") &&
        col("xid") < col("yid"))
      .select(col("xid").as("a"), col("yid").as("b"), ham.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
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

  /** Synthetic MP3 corpus: one spec-correct Layer III frame chain per
    * row, all parameters deterministic id arithmetic (MPEG-1/2 split,
    * the full 1–14 bitrate index range, all three sample-rate indices,
    * all four channel modes, padding bit, ID3v2 prefix on every fifth
    * id) — so the frame-header WALK is exercised with real per-frame
    * lengths and the oracle replays the public tables arithmetically.
    */
  def syntheticMp3(spark: SparkSession, df: DataFrame,
                   idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val mpeg1 = math.floorMod(id, 2) == 0L
        val brIdx = (1 + math.floorMod(id * 7, 14)).toInt
        val srIdx = math.floorMod(id * 11, 3).toInt
        val mode = math.floorMod(id * 13, 4).toInt
        val nFrames = (3 + math.floorMod(id * 17, 7)).toInt
        val padding = math.floorMod(id * 19, 2).toInt
        val id3 = if (math.floorMod(id, 5) == 0L)
          (10 + math.floorMod(id, 50)).toInt else 0
        MediaRecord(id, "audio/mpeg",
          AudioMeta.makeMp3(mpeg1, brIdx, srIdx, mode, nFrames, padding, id3),
          Map("synthetic" -> "true"))
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

  /** Decoded PCM sample stats over the binary column — the audio mirror
    * of [[decodedStats]]: the real [[AudioPcm]] chunk walk + sample decode
    * (WAV unsigned-8/signed-16-LE, AIFF signed-8/signed-16-BE), then an
    * integer fold: sample count, sum, peak |amplitude|, sum of squares
    * (the exact energy — callers derive RMS; no float math here so any
    * engine replays it). Undecodable payloads yield format "unknown".
    */
  def audioPcmStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        AudioPcm.decode(bytes) match {
          case Some(a) =>
            var sum = 0L; var peak = 0L; var sumSq = 0L
            var i = 0
            while (i < a.samples.length) {
              val s = a.samples(i)
              sum += s
              if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
              sumSq += s.toLong * s
              i += 1
            }
            (id, a.format, a.samples.length.toLong, sum, peak, sumSq)
          case None => (id, "unknown", 0L, 0L, 0L, 0L)
        }
      })
      .toDF("id", "format", "n_samples", "sum_val", "peak", "sum_sq")
  }

  /** Synthetic MP4 corpus: one spec-correct ISO-BMFF file per row, all
    * parameters deterministic id arithmetic (four movie timescales, 5–24
    * video samples in 4-per-chunk runs with a short tail chunk, four
    * codec fourccs, an audio track on two of every three ids, a 64-bit
    * largesize mdat on every seventh) — so the box-tree walk and the
    * stts/stsz/stsc/stco sample-table join are exercised on real layouts
    * and the oracle replays the arithmetic.
    */
  def syntheticMp4(spark: SparkSession, df: DataFrame,
                   idCol: String): DataFrame = {
    import spark.implicits._
    val scales = Array(600, 1000, 90000, 48000)
    val codecs = Array("avc1", "hev1", "vp09", "av01")
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val ts = scales(math.floorMod(id * 7, 4).toInt)
        val n = (5 + math.floorMod(id * 31, 20)).toInt
        val delta = ts / 25
        val w = 16 * (4 + math.floorMod(id * 13, 117)).toInt
        val h = 16 * (3 + math.floorMod(id * 19, 64)).toInt
        val codec = codecs(math.floorMod(id * 29, 4).toInt)
        val withAudio = math.floorMod(id, 3) != 0L
        MediaRecord(id, "video/mp4",
          Mp4Meta.makeMp4(ts, n, delta, w, h, codec, withAudio,
            sizeOf = i => 100 + math.floorMod(id + 7L * i, 155).toInt,
            fillOf = i => math.floorMod(id + 11L * i, 251).toInt,
            largeMdat = math.floorMod(id, 7) == 0L),
          Map("synthetic" -> "true"))
      })
      .toDF("id", "media_type", "payload", "meta")
  }

  /** Batched MP4 container-metadata extraction over the binary column —
    * the real [[Mp4Meta.sniff]] box walk per partition, no shuffle;
    * garbage yields brand "unknown" with null fields. duration_ms is
    * integer arithmetic (duration·1000 div timescale).
    */
  def mp4Dims(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        Mp4Meta.sniff(bytes) match {
          case Some(m) => (id, m.brand, Some(m.timescale), Some(m.durationMs),
            Some(m.nTracks), m.width, m.height, m.videoCodec, m.audioCodec)
          case None => (id, "unknown", None, None, None, None, None, None, None)
        }
      })
      .toDF("id", "brand", "timescale", "duration_ms", "n_tracks",
        "width", "height", "vcodec", "acodec")
  }

  /** Frame sampling over the video column: resolve every `stride`-th
    * video sample of each payload to its ABSOLUTE byte range via the
    * sample tables ([[Mp4Meta.videoSamples]]) and fold the actual bytes
    * at that range (exact unsigned sum) — proof the resolved offsets hit
    * the real sample data, which is the whole job of a frame-sampler at
    * 100 TB: fetch byte ranges for every k-th frame, never whole files.
    * Row-local (mapPartitions flatMap), no shuffle; undecodable payloads
    * contribute no rows.
    */
  def mp4FrameSamples(spark: SparkSession, media: DataFrame,
                      stride: Int): DataFrame = {
    require(stride >= 1, s"mp4FrameSamples stride: $stride")
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Mp4Meta.sniff(bytes).zip(Mp4Meta.videoSamples(bytes)).toSeq
          .flatMap { case (info, samples) =>
            samples.iterator.filter(_.idx % stride == 0).map { s =>
              var sum = 0L
              var k = s.offset.toInt
              val end = k + s.size
              while (k < end) { sum += bytes(k) & 0xff; k += 1 }
              (id, s.idx.toLong, s.dts,
                s.dts * 1000L / info.timescale, s.size.toLong, sum)
            }
          }
      })
      .toDF("id", "sample_idx", "dts", "dts_ms", "size", "byte_sum")
  }

  /** Synthetic EXIF corpus: one spec-correct TIFF/EXIF blob per row —
    * IFD0 + Exif sub-IFD with inline AND out-of-line values, both byte
    * orders (even ids "II", odd "MM"), bare TIFF on every third id and
    * the JPEG APP1 wrapper otherwise — all field values deterministic id
    * arithmetic so the oracle replays them.
    */
  def syntheticExif(spark: SparkSession, df: DataFrame,
                    idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val day = 1 + math.floorMod(id, 28)
        val hour = math.floorMod(id, 24)
        val tiff = ExifMeta.makeExifTiff(
          le = math.floorMod(id, 2) == 0L,
          orientation = (1 + math.floorMod(id * 3, 8)).toInt,
          make = "Make" + math.floorMod(id, 7),
          model = "Cam" + math.floorMod(id, 13),
          dateTime = f"2024:01:$day%02d $hour%02d:00:00",
          exposureDen = 1L << math.floorMod(id, 10),
          iso = (100 * (1 + math.floorMod(id * 5, 32))).toInt,
          width = 640 + 16 * math.floorMod(id, 60),
          height = 480 + 16 * math.floorMod(id, 40))
        val payload =
          if (math.floorMod(id, 3) == 0L) tiff else ExifMeta.wrapJpeg(tiff)
        MediaRecord(id,
          if (math.floorMod(id, 3) == 0L) "image/tiff" else "image/jpeg",
          payload, Map("synthetic" -> "true"))
      })
      .toDF("id", "media_type", "payload", "meta")
  }

  /** Batched EXIF extraction over the binary column — the real
    * [[ExifMeta.sniff]] IFD walk per partition, no shuffle; garbage
    * yields container "unknown" with null fields.
    */
  def exifDims(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ExifMeta.sniff(bytes) match {
          case Some(e) => (id, e.container, e.byteOrder, e.orientation,
            e.make, e.model, e.dateTime, e.exposureDen, e.iso,
            e.width, e.height)
          case None => (id, "unknown", "", None, None, None, None, None,
            None, None, None)
        }
      })
      .toDF("id", "container", "byte_order", "orientation", "make",
        "model", "dt", "exposure_den", "iso", "width", "height")
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

package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Multimodal => MM}

/** Multimodal column plumbing: binary payloads + metadata, batched
  * decode/feature extraction (the mapInPandas shape), stub codec contracts.
  * The byte-level oracle queries (q_media_stats/q_media_hist) cover the
  * fixture-scale path.
  */
class MultimodalSpec extends SparkTestBase {

  test("asMedia wraps a table into (id, media_type, payload, meta)") {
    val m = MM.asMedia(graft.core.Tables.documents(spark, sfDir), "doc_id", "text")
    assert(m.columns.toSeq == Seq("id", "media_type", "payload", "meta"))
    val r = m.orderBy("id").head()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(r.getAs[Map[String, String]]("meta")("src_col") == "text")
  }

  test("payload histogram counts every byte exactly once (incl. multi-byte UTF-8)") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "中文")).toDF("doc_id", "text") // CJK = 3 bytes each
    val f = MM.extractFeatures(spark, MM.asMedia(df, "doc_id", "text"))
      .collect().map(x => x.id -> x).toMap
    assert(f(1L).nBytes == 3 && f(1L).hist.sum == 3)
    assert(f(1L).hist(1) == 3) // 'a','b','c' all in [64,128)
    assert(f(2L).nBytes == 6 && f(2L).hist.sum == 6) // byte-level, not codepoint
    // L1-normalized feature
    assert(math.abs(f(1L).feature.map(_.toDouble).sum - 1.0) < 1e-6)
  }

  test("stub codec is deterministic and resize preserves aspect contract") {
    val d1 = MM.Codec.decode(7L, Array[Byte](1, 2, 3))
    val d2 = MM.Codec.decode(7L, Array[Byte](1, 2, 3))
    assert(d1 == d2)
    val r = MM.Codec.resizeMeta(d1.copy(width = 1000, height = 500), maxDim = 100)
    assert(r.width == 100 && r.height == 50)
  }

  test("frame sampling strides fixed-size slices") {
    val frames = MM.Codec.frameSample(Array.tabulate[Byte](100)(_.toByte),
      frameSize = 10, stride = 3)
    assert(frames.length == 4) // slices 0,3,6,9
    assert(frames.head.toSeq == (0 until 10).map(_.toByte))
  }

  test("decodeAll runs the codec per partition over the dataset") {
    val m = MM.asMedia(graft.core.Tables.documents(spark, sfDir), "doc_id", "text")
    val out = MM.decodeAll(spark, m)
    assert(out.count() == m.count())
    val first = out.orderBy("id").head()
    assert(first.width >= 16 && first.height >= 16)
  }

  test("CDC chunking covers the payload exactly and re-syncs after an insert") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val body = Array.fill[Byte](20000)(rnd.nextInt(256).toByte)
    val shifted = Array.fill[Byte](37)(rnd.nextInt(256).toByte) ++ body
    val media = Seq((1L, body), (2L, shifted)).toDF("id", "payload")
    val chunks = MM.cdcChunks(spark, media, maskBits = 8,
      minChunk = 64, maxChunk = 2048).collect()

    // lossless coverage: contiguous, in order, sums to the payload length
    for ((id, len) <- Seq(1L -> body.length, 2L -> shifted.length)) {
      val cs = chunks.filter(_.id == id).sortBy(_.idx)
      assert(cs.map(_.nBytes.toLong).sum == len)
      assert(cs.head.offset == 0L)
      cs.sliding(2).foreach { case Array(a, b) =>
        assert(b.offset == a.offset + a.nBytes)
      case _ => }
    }
    // shift-resistance: a 37-byte prefix insert must NOT re-chunk the
    // whole file — the two versions share most segment fingerprints
    // (fixed-size splitting would share none)
    val f1 = chunks.filter(_.id == 1L).map(_.fp).toSet
    val f2 = chunks.filter(_.id == 2L).map(_.fp).toSet
    val shared = (f1 & f2).size.toDouble / f1.size
    assert(shared > 0.8, s"shared=$shared f1=${f1.size} f2=${f2.size}")
    // cross-file dedup is one groupBy(fp)
    val dup = MM.cdcChunks(spark, media, maskBits = 8, minChunk = 64,
      maxChunk = 2048).groupBy("fp").count().filter(col("count") > 1).count()
    assert(dup > 0)
  }
}

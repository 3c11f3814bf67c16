package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Incremental processing (#23): the same declarative operators running on
  * micro-batches via MemoryStream, with watermark/state semantics.
  */
class StreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("windowed agg counts per tumbling window and key") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val agg = Streams.windowedAgg(
      in.toDF.toDF("ts", "user_id", "value"), "ts", "user_id", "value",
      windowLen = "10 seconds", watermarkDelay = "5 seconds")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData((ts(1), 7L, 2.0), (ts(3), 7L, 3.0), (ts(12), 7L, 4.0), (ts(4), 8L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .selectExpr("user_id", "cnt", "total").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // user 7: window [0,10) has 2 events totaling 5.0; [10,20) has 1 of 4.0
      assert(rows == Set((7L, 2L, 5.0), (7L, 1L, 4.0), (8L, 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val out = Streams.dedupStream(in.toDF.toDF("ts", "id"), "ts", Seq("id"), "5 seconds")
    val q = out.writeStream.format("memory").queryName("dedup_s")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), 1L), (ts(1), 1L), (ts(2), 2L))
      q.processAllAvailable()
      in.addData((ts(1), 1L), (ts(3), 3L)) // replay of id=1 dropped
      q.processAllAvailable()
      assert(spark.table("dedup_s").select("id").as[Long].collect().sorted.toSeq
        == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionize closes a session when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = Streams.sessionize(spark, in.toDS, gapMs = 5000)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((5L, ts(1), 1.5), (5L, ts(2), 2.5))
      q.processAllAvailable()
      // a much-later event advances the event-time watermark past
      // lastTs(=2s) + gap(5s), closing user 5's session
      in.addData((6L, ts(60), 9.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[graft.streaming.SessionResult]
        .collect().filter(_.userId == 5L)
      assert(sessions.length == 1)
      assert(sessions.head.nEvents == 2 && sessions.head.totalValue == 4.0)
      assert(sessions.head.firstTs == 1000L && sessions.head.lastTs == 2000L)
    } finally q.stop()
  }

  test("incremental word count matches the batch operator semantics") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val out = Streams.wordCountStream(in.toDF.toDF("text"), "text")
    val q = out.writeStream.format("memory").queryName("wc_s")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData("spark maps rows", "spark reduces")
      q.processAllAvailable()
      val m = spark.table("wc_s").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m == Map("spark" -> 2L, "maps" -> 1L, "rows" -> 1L, "reduces" -> 1L))
    } finally q.stop()
  }
}

package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {

  test("as-of join picks most recent right value at or before left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05")),
      (2L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10")),
      (3L, 20L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"))
    ).toDF("id", "k", "ts")
    val right = Seq(
      (10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 1.0),
      (10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 2.0), // tie: inclusive
      (20L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 9.0)  // after left: no match
    ).toDF("k", "ts", "v")
    val got = AsOfJoin.lastValueAsOf(left, right, "k", "ts", "v")
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(1.0))   // last v at/before 00:05 is 1.0
    assert(got(2L).contains(2.0))   // equal ts matches (inclusive)
    assert(got(3L).isEmpty)         // nothing at/before 00:01
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Registered custom aggregates — Disco's `sum_combiner`/`sum_reduce` and
  * kvgroup folded into Spark's `Aggregator` surface (§2.10; reference:
  * lib/disco/worker/classic/func.py:160-184) so they work from both the
  * Dataset API and SQL text after [[register]].
  *
  * `Aggregator` is the scale-correct UDAF: merge() gives Catalyst a
  * map-side partial aggregate (the combiner), unlike a naive collect-based
  * UDF.
  */
object Udafs {

  /** sum_combiner/sum_reduce (func.py:175-184): long sum with partial agg. */
  val sumLong: Aggregator[Long, Long, Long] = new Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b + a
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** kvgroup as an aggregate (util.py:101-110): deterministic sorted,
    * comma-joined value list per key.
    */
  val kvGroupJoin: Aggregator[String, List[String], String] =
    new Aggregator[String, List[String], String] {
      def zero: List[String] = Nil
      def reduce(b: List[String], a: String): List[String] = a :: b
      def merge(b1: List[String], b2: List[String]): List[String] = b1 ::: b2
      def finish(b: List[String]): String = b.sorted.mkString(",")
      def bufferEncoder: Encoder[List[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** KMV bottom-k distinct-count sketch as a typed Aggregator over
    * PRE-HASHED 60-bit values ([[Sketches.hash60]]): buffer = the k
    * smallest distinct hashes seen, sorted ascending. `merge` makes it a
    * true mergeable sketch — Catalyst gets map-side partials, and (the
    * point of the Aggregator form) a STREAMING window aggregation can
    * carry it as per-window state ([[graft.streaming.Streams
    * .distinctCountStream]]), which the TakeOrdered-shaped batch op
    * ([[Sketches.kmvDistinct]]) cannot. `finish` reproduces
    * kmvDistinct's estimate bit-for-bit (exact below k, else
    * (k−1)·2⁶⁰/kth rounded 6, HALF_UP like Spark's `round`) — so the
    * two forms share one oracle.
    */
  def kmvSketch(k: Int): Aggregator[Long, Seq[Long], Double] = {
    require(k >= 3, s"KMV needs k >= 3 (got $k)")
    new Aggregator[Long, Seq[Long], Double] {
      def zero: Seq[Long] = Vector.empty
      def reduce(b: Seq[Long], h: Long): Seq[Long] =
        if (b.length == k && h >= b.last) b
        else if (b.contains(h)) b
        else ((b :+ h).sorted: Seq[Long]).take(k)
      def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
        ((b1 ++ b2).distinct.sorted: Seq[Long]).take(k)
      def finish(b: Seq[Long]): Double =
        if (b.length < k) b.length.toDouble
        else BigDecimal((k - 1).toDouble * math.pow(2.0, 60) / b.last.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      def bufferEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
  }

  /** Register for SQL use: `SELECT graft_sum(x), graft_kvgroup(v) ...`. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_sum", udaf(sumLong))
    spark.udf.register("graft_kvgroup", udaf(kvGroupJoin))
    spark.udf.register("graft_kmv256", udaf(kmvSketch(256)))
  }
}

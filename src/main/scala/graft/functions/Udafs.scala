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

  /** Register for SQL use: `SELECT graft_sum(x), graft_kvgroup(v) ...`. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_sum", udaf(sumLong))
    spark.udf.register("graft_kvgroup", udaf(kvGroupJoin))
  }
}

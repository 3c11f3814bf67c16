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
      // Hot path: the buffer is ALWAYS sorted ascending, so membership +
      // insertion point come from one binary search and the insert is a
      // single splice — O(log k) compare work per row instead of the
      // O(k) contains + O(k log k) re-sort (round 9, advisor catch; this
      // runs per input row on the streaming per-window path with k=256).
      def reduce(b: Seq[Long], h: Long): Seq[Long] =
        if (b.length == k && h >= b.last) b
        else {
          val arr = b.toIndexedSeq
          var lo = 0; var hi = arr.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (arr(mid) < h) lo = mid + 1 else hi = mid
          }
          if (lo < arr.length && arr(lo) == h) b // already present
          else (arr.patch(lo, Seq(h), 0): Seq[Long]).take(k)
        }
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

  /** The HyperLogLog sketch ([[Sketches.hllDistinct]]'s 256-register
    * geometry) as a typed Aggregator over PRE-HASHED 60-bit values:
    * buffer = the 256 register ranks — 256 ints of TRULY FIXED state per
    * group/window, where KMV's bottom-k buffer still grows to k entries.
    * `merge` is the per-register MAX (the lossless shard-combine the
    * batch spec pins), and `finish` replays [[Sketches.hllDistinct]]'s
    * estimate bit-for-bit: the same exact-int64 harmonic sum, the same
    * single `HllAlphaNum / S` division (Spark `log` and `round` are
    * `math.log` / BigDecimal HALF_UP — reproduced literally), so the
    * streaming window estimate equals the batch sketch of the same slice
    * ([[graft.streaming.Streams.hllDistinctStream]], parity spec'd).
    */
  val hllSketch: Aggregator[Long, Seq[Int], Double] =
    new Aggregator[Long, Seq[Int], Double] {
      import Sketches.{HllM, HllValueBits, HllMaxRank, HllValueMask,
        HllAlphaNum, HllSmallRange}
      def zero: Seq[Int] = Vector.fill(HllM)(0)
      def reduce(b: Seq[Int], h: Long): Seq[Int] = {
        val bucket = (h >>> HllValueBits).toInt
        val v = h & HllValueMask
        val rank =
          if (v == 0L) HllMaxRank
          else HllMaxRank - (64 - java.lang.Long.numberOfLeadingZeros(v))
        if (rank > b(bucket)) b.updated(bucket, rank) else b
      }
      def merge(b1: Seq[Int], b2: Seq[Int]): Seq[Int] =
        b1.lazyZip(b2).map(math.max)
      def finish(b: Seq[Int]): Double = {
        var s = 0L
        var zeros = 0L
        b.foreach { reg =>
          s += 1L << (HllMaxRank - reg)
          if (reg == 0) zeros += 1
        }
        val raw = HllAlphaNum / s.toDouble
        val est =
          if (raw <= HllSmallRange && zeros > 0)
            HllM.toDouble * math.log(HllM.toDouble / zeros.toDouble)
          else raw
        BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      def bufferEncoder: Encoder[Seq[Int]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** The quantile sketch ([[Sketches.quantileSketch]]'s bottom-k hash
    * sample) as a typed Aggregator over (hash60, value) pairs: buffer =
    * the k rows with smallest (h, v), kept as a MULTISET (the batch op
    * samples rows, not distinct values) sorted ascending. `finish` reads
    * the requested quantiles off the sample with EXACTLY the batch op's
    * lower-discrete rule (min value whose peers-through cume reaches q),
    * so per-window streaming estimates match batch sketches of the same
    * slice bit-for-bit ([[graft.streaming.Streams.quantilesStream]],
    * parity spec'd). Output: one Double per requested quantile, in
    * ascending-q order; all NaN when the window saw no rows.
    */
  def quantileSketchAgg(k: Int, qs: Seq[Double]): Aggregator[(Long, Double), Seq[(Long, Double)], Seq[Double]] = {
    require(k >= 8, s"quantileSketchAgg needs k >= 8 (got $k)")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    val qsSorted = qs.sorted
    new Aggregator[(Long, Double), Seq[(Long, Double)], Seq[Double]] {
      def zero: Seq[(Long, Double)] = Vector.empty
      // Sorted-buffer binary-search insert, same rationale as
      // [[kmvSketch]].reduce; multiset semantics so no duplicate check.
      private def lt(x: (Long, Double), y: (Long, Double)): Boolean =
        x._1 < y._1 || (x._1 == y._1 && x._2 < y._2)
      def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
        if (b.length == k && !lt(a, b.last)) b
        else {
          val arr = b.toIndexedSeq
          var lo = 0; var hi = arr.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (lt(arr(mid), a)) lo = mid + 1 else hi = mid
          }
          (arr.patch(lo, Seq(a), 0): Seq[(Long, Double)]).take(k)
        }
      def merge(b1: Seq[(Long, Double)], b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
        ((b1 ++ b2).sortBy(t => (t._1, t._2)): Seq[(Long, Double)]).take(k)
      def finish(b: Seq[(Long, Double)]): Seq[Double] = {
        if (b.isEmpty) return qsSorted.map(_ => Double.NaN)
        val vs = b.map(_._2).sorted
        val n = vs.length
        def est(q: Double): Double = {
          var i = 0
          while (i < n) {
            var j = i
            while (j + 1 < n && vs(j + 1) == vs(i)) j += 1
            if ((j + 1).toDouble / n >= q) return vs(i)
            i = j + 1
          }
          vs.last
        }
        qsSorted.map(est)
      }
      def bufferEncoder: Encoder[Seq[(Long, Double)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }
  }

  /** Register for SQL use: `SELECT graft_sum(x), graft_kvgroup(v) ...`. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_sum", udaf(sumLong))
    spark.udf.register("graft_kvgroup", udaf(kvGroupJoin))
    spark.udf.register("graft_kmv256", udaf(kmvSketch(256)))
  }
}

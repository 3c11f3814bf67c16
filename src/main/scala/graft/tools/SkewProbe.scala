package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the three skew-join strategies on a PLANTED 80%-hot-key join
  * so the [[graft.ops.ScaleOps.chooseJoinPlan]] threshold is backed by
  * numbers, not folklore:
  *
  *  - `plain`: sort-merge join with AQE skew-splitting OFF — the true
  *    straggler baseline (one task sorts/joins 80% of the fact side);
  *  - `aqe`: AQE skew-split ON with thresholds lowered to fire at fixture
  *    sizes (the defaults are 256 MB-per-partition, tuned for clusters);
  *  - `salted`: [[graft.ops.ScaleOps.saltedJoin]], hot rows scattered
  *    over `salt` tasks by content hash.
  *
  * Broadcast is disabled throughout — at 100 TB the dim side of a skewed
  * fact⋈dim is exactly the thing that often DOESN'T fit the broadcast
  * budget, and with a broadcast join there is no shuffle skew to measure.
  *
  * Fact: n rows, 80% on key 0, the rest uniform over 1000 keys.
  * Dim: 1000 keys, one row each. All three modes must agree on the
  * joined count + payload sum (asserted).
  *
  * Usage: runMain graft.tools.SkewProbe [n] (default 2000000);
  * prints {"n":…,"hot_share":…,"router":…,"secs":{plain,aqe,salted}}.
  */
object SkewProbe {

  def fact(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      when(pmod(col("id"), lit(10)) < 8, 0L)
        .otherwise(pmod(hash(col("id")), lit(1000)).cast("long")).as("k"),
      col("id").as("payload"))

  def dim(spark: SparkSession): DataFrame =
    spark.range(1000).select(col("id").as("sk"), (col("id") * 7).as("dimv"))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = graft.core.GraftSession
      .builder("graft-skew-probe", cores = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val f = fact(spark, n).cache()
    val d = dim(spark).cache()
    f.count(); d.count()

    def agg(j: DataFrame): DataFrame =
      j.agg(count(lit(1)).as("n"), sum(col("payload") + col("dimv")).as("s"))

    def timed(body: => DataFrame): (Double, Seq[Any]) = {
      val t0 = System.nanoTime()
      val df = agg(body)
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, df.collect()(0).toSeq)
    }

    def withConf[A](kv: (String, String)*)(body: => A): A = {
      val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    val (plainSecs, plainAns) = withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      timed(f.join(d, f("k") === d("sk")))
    }
    val (aqeSecs, aqeAns) = withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m") {
      timed(f.join(d, f("k") === d("sk")))
    }
    val (saltSecs, saltAns) = withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      timed(graft.ops.ScaleOps.saltedJoin(f, d, "k", "sk", salt = 32))
    }
    require(plainAns == aqeAns && aqeAns == saltAns,
      s"strategies disagree: $plainAns / $aqeAns / $saltAns")

    val hot = graft.ops.ScaleOps.skewProfile(f, "k", topK = 1)
      .collect().head.getAs[Double]("share")
    val routedAqeOn = graft.ops.ScaleOps.chooseJoinPlan(f, "k")
    val routedAqeOff = withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      graft.ops.ScaleOps.chooseJoinPlan(f, "k")
    }
    println(f"""{"n":$n,"hot_share":$hot,"router_aqe_on":"$routedAqeOn","router_aqe_off":"$routedAqeOff","secs":{"plain":$plainSecs%.2f,"aqe":$aqeSecs%.2f,"salted":$saltSecs%.2f}}""")
    spark.stop()
  }
}

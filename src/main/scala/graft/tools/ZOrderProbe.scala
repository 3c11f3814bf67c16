package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the z-order sink buys a REAL benched query — the TPC-H
  * Q6 shape (date window + discount band scan-aggregate) — against the
  * same data in (a) its natural load order and (b) a leading-column
  * lexicographic sort, the two layouts a warehouse would otherwise have.
  *
  * lineitem is rewritten three ways with two derived layout columns
  * (ship day number, discount cents — the normalize-to-interleave-range
  * step [[graft.io.Sinks.writeZOrdered]] documents), then the probe
  * reports, per layout:
  *
  *  - row groups whose footer min/max stats SURVIVE the Q6 compound
  *    predicate (what a scan must read) vs total row groups — the same
  *    stats pruning measured from real parquet footers as ZOrderSpec;
  *  - wall time of the Q6 aggregate over that layout (noop-sinked,
  *    best of 3).
  *
  * Usage: runMain graft.tools.ZOrderProbe [sfDir] — results feed
  * BENCH_NOTES ("z-order round-trip", VERDICT r8 item 8).
  */
object ZOrderProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = graft.core.GraftSession
      .builder("graft-zorder-probe", cores = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._

    val base = graft.io.IoScratch.dir + "/zorder_probe"
    new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()

    // derived layout columns, kept in the schema so predicates hit the
    // SAME columns whose stats order the files
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .withColumn("ship_day", datediff(col("l_shipdate"), lit("1992-01-01")))
      .withColumn("disc_cents",
        (col("l_discount").cast("decimal(18,2)") * 100).cast("long"))
      // the normalize-to-interleave-range step the sink documents: cents
      // span 0..10 (4 bits) vs days 0..~2500 (12 bits) — interleaved raw,
      // every high Morton bit would be a DAY bit and the layout degrades
      // to a date sort (measured: zero discount pruning); scaling cents
      // ×256 gives both dimensions comparable bit-weight
      .withColumn("disc_scaled", col("disc_cents") * 256)
    // no-layout baseline: 32 hash-shuffled files, the row-group count of
    // the sorted layouts with none of the ordering (what a parallel bulk
    // load produces — the fixture's single file would give plain ONE row
    // group and nothing to compare)
    li.repartition(32).write.mode("overwrite").parquet(s"$base/plain")
    // lexicographic on the leading predicate column only
    li.repartitionByRange(32, col("ship_day"))
      .sortWithinPartitions("ship_day")
      .write.mode("overwrite").parquet(s"$base/lex")
    // z-order on BOTH predicate dimensions (cents pre-scaled)
    graft.io.Sinks.writeZOrdered(li, s"$base/z",
      Seq("ship_day", "disc_scaled"), bits = 12, numFiles = 32)

    // Q6 predicate in layout-column terms: one ship year + discount band
    val dayLo = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse("1992-01-01"),
      java.time.LocalDate.parse("1997-01-01"))
    val dayHi = dayLo + 365
    val (cLo, cHi) = (5L, 7L)

    def rowGroups(dir: String, useDay: Boolean, useCents: Boolean): (Int, Int) = {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      var total = 0
      var scanned = 0
      fs.listStatus(p).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(f.getPath, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getBlocks.asScala.foreach { b =>
            val stats = b.getColumns.asScala.map { c =>
              c.getPath.toDotString -> c.getStatistics
            }.toMap
            def rangeOf(c: String): (Long, Long) = {
              val s = stats(c)
              (s.genericGetMin, s.genericGetMax) match {
                case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                  (mn.longValue(), mx.longValue())
                case (mn: java.lang.Long, mx: java.lang.Long) =>
                  (mn.longValue(), mx.longValue())
                case other =>
                  sys.error(s"unexpected stats type for $c: $other")
              }
            }
            val (dMin, dMax) = rangeOf("ship_day")
            val (cMin, cMax) = rangeOf("disc_cents")
            total += 1
            val survives =
              (!useDay || (dMax >= dayLo && dMin < dayHi)) &&
                (!useCents || (cMax >= cLo && cMin <= cHi))
            if (survives) scanned += 1
          } finally r.close()
        }
      (scanned, total)
    }

    def q6(dir: String): DataFrame =
      spark.read.parquet(dir)
        .filter(col("ship_day") >= dayLo && col("ship_day") < dayHi &&
          col("disc_cents").between(cLo, cHi) &&
          col("l_quantity").cast("decimal(18,2)") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))

    // the SECONDARY-dimension query: discount band only (a data-quality
    // sweep over all years) — the query shape a leading-column sort is
    // blind to, and the reason to pay for z-order at all
    def discOnly(dir: String): DataFrame =
      spark.read.parquet(dir)
        .filter(col("disc_cents").between(cLo, cHi))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"), count(lit(1)).as("n"))

    def timed(df: => DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    val out = Seq("plain", "lex", "z").map { name =>
      val dir = s"$base/$name"
      val (q6Scan, total) = rowGroups(dir, useDay = true, useCents = true)
      val (dScan, _) = rowGroups(dir, useDay = false, useCents = true)
      val q6Secs = timed(q6(dir))
      val dSecs = timed(discOnly(dir))
      f"""\"$name\":{\"total\":$total,\"q6_scanned\":$q6Scan,\"q6_secs\":$q6Secs%.3f,\"disc_scanned\":$dScan,\"disc_secs\":$dSecs%.3f}"""
    }
    // sanity: all three layouts hold identical data and agree on Q6
    val answers = Seq("plain", "lex", "z")
      .map(n => q6(s"$base/$n").collect()(0).toSeq)
    require(answers.distinct.size == 1,
      s"layouts disagree on Q6: $answers")
    println(s"""{"sf":"$sfDir",${out.mkString(",")}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Morton/Z-order interleave: golden bits, reference-model agreement
  * through the codegen path, per-coordinate monotonicity, and the quadrant
  * invariant that makes the layout file-skipping-friendly.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def ref(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | (((x >>> i) & 1L) << (2 * i)) | (((y >>> i) & 1L) << (2 * i + 1))
    }

  test("golden: z(5, 3) at 3 bits interleaves to 27") {
    // x=101, y=011 -> even bits 1,0,1 / odd bits 1,1,0 -> 011011
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.z_order(col("x"), col("y"), 3)).head().getLong(0)
    assert(got == 27L)
    assert(ref(5L, 3L, 3) == 27L)
  }

  test("codegen path agrees with the reference model on random values") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(500)((rnd.nextLong().abs % 65536, rnd.nextLong().abs % 65536))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.z_order(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == ref(x, y, 16), s"z($x, $y) = $z != ${ref(x, y, 16)}")
    }
  }

  test("monotone in each coordinate; null in -> null out") {
    for (_ <- 1 to 200) {
      val rnd = new scala.util.Random(7)
      val x = rnd.nextInt(30000).toLong; val y = rnd.nextInt(30000).toLong
      assert(ref(x + 1, y, 16) > ref(x, y, 16))
      assert(ref(x, y + 1, 16) > ref(x, y, 16))
    }
    val n = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(ZOrder.z_order(col("x"), col("y"), 8)).head()
    assert(n.isNullAt(0))
  }

  test("quadrant invariant: equal zval>>2k bounds both coordinates within 2^k") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(4000)((rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.z_order(col("x"), col("y"), 12).as("z"))
    val boxes = df.groupBy(shiftright(col("z"), 8).as("bucket")) // k = 4
      .agg((max("x") - min("x")).as("wx"), (max("y") - min("y")).as("wy"))
      .agg(max("wx"), max("wy")).head()
    assert(boxes.getLong(0) < 16 && boxes.getLong(1) < 16,
      s"z-bucket box exceeded 2^4: $boxes")
  }

  test("n-ary interleave: golden bits, codegen agrees with reference, nulls propagate") {
    def refN(vals: Seq[Long], bits: Int): Long = {
      val n = vals.size
      vals.zipWithIndex.foldLeft(0L) { case (z, (v, j)) =>
        (0 until bits).foldLeft(z)((acc, i) =>
          acc | (((v >>> i) & 1L) << (i * n + j)))
      }
    }
    // golden: x=1,y=1,z=1 at 1 bit -> bits 0,1,2 set = 7
    assert(refN(Seq(1L, 1L, 1L), 1) == 7L)
    val got7 = Seq((1L, 1L, 1L)).toDF("x", "y", "z")
      .select(ZOrder.z_order_n(1, col("x"), col("y"), col("z")))
      .head().getLong(0)
    assert(got7 == 7L)
    // randomized agreement through the DataFrame (codegen) path
    val rnd = new scala.util.Random(5)
    val cases = Seq.fill(300)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = cases.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        ZOrder.z_order_n(16, col("x"), col("y"), col("z")).as("m"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, z, m) =>
      assert(m == refN(Seq(x, y, z), 16), s"($x,$y,$z)")
    }
    // 2-ary InterleaveBitsN must equal the binary InterleaveBits
    val two = cases.toDF("x", "y", "z")
      .select(ZOrder.z_order(col("x"), col("y"), 16).as("a"),
        ZOrder.z_order_n(16, col("x"), col("y")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(two == 0L)
    val n = Seq((Some(1L), Option.empty[Long], Some(2L))).toDF("x", "y", "z")
      .select(ZOrder.z_order_n(8, col("x"), col("y"), col("z"))).head()
    assert(n.isNullAt(0))
  }

  test("written z-order files carry tight per-file boxes on BOTH columns") {
    val rnd = new scala.util.Random(19)
    val df = Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val base = graft.io.IoScratch.dir + "/zorder_layout"
    new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    // z-order layout vs the lexicographic strawman, 16 files each
    graft.ops.ScaleOps.zorderLayout(df, "x", "y", 10, partitions = 16)
      .drop("zval").write.parquet(base + "/z")
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(base + "/lex")
    def avgWidth(path: String, c: String): Double = {
      val s = graft.ops.ScaleOps.fileBoxStats(spark, path, "x", "y")
        .select(avg(col(s"max_$c") - col(s"min_$c"))).head()
      s.getDouble(0)
    }
    // lexicographic: x tight but every file spans ~the full y range
    assert(avgWidth(base + "/lex", "y") > 900.0)
    // z-order: BOTH dimensions bounded well below the full range — the
    // footer min/max a scan prunes with are selective on either column
    val zy = avgWidth(base + "/z", "y")
    val zx = avgWidth(base + "/z", "x")
    assert(zy < 600.0, s"z-layout y-width $zy not selective")
    assert(zx < 600.0, s"z-layout x-width $zx not selective")
  }

  test("writeZOrdered sink: parquet row-group stats skip files on EITHER predicate column") {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(23)
    val df = Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val base = graft.io.IoScratch.dir + "/zorder_sink"
    new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    graft.io.Sinks.writeZOrdered(df, base + "/z", Seq("x", "y"),
      bits = 10, numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(base + "/lex")
    // read the REAL parquet footers — these row-group min/max stats are
    // exactly what a scan's filter pushdown prunes with
    def rowGroupStats(dir: String): Seq[Map[String, (Long, Long)]] = {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      fs.listStatus(p).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(f.getPath, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getBlocks.asScala.toSeq.map { b =>
            b.getColumns.asScala.map { c =>
              val s = c.getStatistics
              c.getPath.toDotString ->
                (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                 s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
            }.toMap
          } finally r.close()
        }
    }
    // predicate col BETWEEN 0 AND 127 (1/8 of the key range): a row group
    // is SKIPPED when its stats window misses the predicate entirely
    def skipped(stats: Seq[Map[String, (Long, Long)]], c: String): Int =
      stats.count(m => m(c)._1 > 127L)
    val z = rowGroupStats(base + "/z")
    val lex = rowGroupStats(base + "/lex")
    assert(z.size >= 16, s"expected >=16 z row groups, got ${z.size}")
    // z-order: the stats prune MOST row groups on either column
    assert(skipped(z, "x") >= z.size / 2,
      s"z-layout skipped only ${skipped(z, "x")}/${z.size} on x")
    assert(skipped(z, "y") >= z.size / 2,
      s"z-layout skipped only ${skipped(z, "y")}/${z.size} on y")
    // lexicographic strawman: tight on the leading column, blind on y —
    // every file spans ~the full y range so nothing skips
    assert(skipped(lex, "x") >= lex.size / 2)
    assert(skipped(lex, "y") == 0,
      s"lex layout unexpectedly skipped ${skipped(lex, "y")} on y")
  }

  test("zorderLayout emits zval-sorted partitions covering disjoint z-ranges") {
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(2000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val laid = graft.ops.ScaleOps.zorderLayout(df, "x", "y", 10, partitions = 8)
    val perPart = laid
      .select(spark_partition_id().as("pid"), col("zval"))
      .groupBy("pid").agg(min("zval").as("lo"), max("zval").as("hi"))
      .orderBy("pid").as[(Int, Long, Long)].collect()
    // range partitioning: partitions cover non-overlapping z ranges
    perPart.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, s"overlap: $a vs $b")
      case _ =>
    }
  }
}

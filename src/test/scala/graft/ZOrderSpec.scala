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

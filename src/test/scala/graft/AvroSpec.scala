package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro OCF reader/writer: exact round-trip incl. nulls and binary,
  * by-name mapping against schema-evolved files, and the writer-schema
  * honoring contract. The oracle query (q_avro_roundtrip) covers the
  * fixture-scale path against the parquet source.
  */
class AvroSpec extends SparkTestBase {

  private def scratch(name: String) =
    graft.io.IoScratch.dir + "/avro_spec_" + name

  test("round-trip is exact: longs, doubles, strings, booleans, nulls, bytes") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("bin", BinaryType)))
    val rows = Seq(
      Row(1L, 1.5, "hello", true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, false, null),
      Row(3L, -0.25, "中文 λ", null, Array[Byte]()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = scratch("rt")
    graft.io.Avro.write(df, path)
    val back = graft.io.Avro.read(spark, path + "/*.avro", schema)
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getLong(0) == 1L && back(0).getString(2) == "hello")
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(4))
    assert(back(2).getString(2) == "中文 λ")
    assert(back(0).getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2, 3))
    assert(back(2).getAs[Array[Byte]](4).isEmpty)
  }

  test("reader maps by field NAME: reordered writer schema still lands correctly") {
    val writerSchema = StructType(Seq(
      StructField("extra", StringType), StructField("v", LongType),
      StructField("k", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("junk", 7L, "key7")), 1),
      writerSchema)
    val path = scratch("evolve")
    graft.io.Avro.write(df, path)
    // target schema: different order, subset
    val target = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val got = graft.io.Avro.read(spark, path + "/*.avro", target).head()
    assert(got.getString(0) == "key7" && got.getLong(1) == 7L)
  }

  test("files are real OCF: magic Obj1 and one file per non-empty partition") {
    val df = graft.core.Tables.documents(spark, sfDir).repartition(4)
    val path = scratch("ocf")
    graft.io.Avro.write(df, path)
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 4)
    files.foreach { f =>
      val head = java.nio.file.Files.readAllBytes(f.toPath).take(4)
      assert(head.toSeq == Seq[Byte]('O', 'b', 'j', 1))
    }
    // …and the distributed read sees every row exactly once
    val n = graft.io.Avro.read(spark, path + "/*.avro", df.schema).count()
    assert(n == df.count())
  }
}

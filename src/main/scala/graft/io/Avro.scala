package graft.io

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter,
  SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro Object Container File reader/writer — the OTHER interchange
  * format training pipelines move row data in (schema'd, splittable,
  * append-friendly), built directly on the avro library since the
  * spark-avro connector is not on this classpath. The reference's io
  * surface was scheme-pluggable readers over opaque blobs
  * (lib/disco/schemes/); this is that extension point exercised with a
  * real schema'd container format.
  *
  * Format (Avro 1.12 spec): magic `Obj\1`, file metadata map carrying
  * the WRITER's schema JSON + codec, then blocks of
  * `(count, byte-length, deflated datum bytes, 16-byte sync marker)`.
  * The reader honors the embedded writer schema and maps values to the
  * caller's Spark schema BY FIELD NAME (Utf8 → String, ByteBuffer →
  * bytes), so schema-evolved files with reordered fields still land
  * correctly.
  *
  * Distribution contract: one `.avro` file per partition on write
  * (deflate-6), task-per-file on read — the [[Warc]] pattern. OCF is
  * block-splittable via sync markers, so a block-grain split is the
  * scale-up path when single files outgrow a task; at the
  * file-per-partition sizes this writer produces, file grain IS block
  * grain. Same shared-filesystem assumption as [[DiscoChunk]]/[[Warc]]
  * (java.io in foreachPartition — local mode/NFS; route through the
  * Hadoop FileSystem API for HDFS/S3).
  */
object Avro {

  /** Spark → Avro schema (nullable fields become `[null, T]` unions). */
  def avroSchema(st: StructType, name: String): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other =>
          throw new IllegalArgumentException(s"avro write: $other")
      }
      val s = if (f.nullable)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      else base
      fields.add(new Schema.Field(f.name, s, null.asInstanceOf[String]))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  /** Write one deflate-6 OCF per partition (overwrite semantics). */
  def write(df: DataFrame, path: String): Unit = {
    val dir = new java.io.File(path)
    new scala.reflect.io.Directory(dir).deleteRecursively()
    dir.mkdirs()
    val sparkSchema = df.schema
    val schemaJson = avroSchema(sparkSchema, "GraftRecord").toString
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(CodecFactory.deflateCodec(6))
        w.create(schema, new java.io.File(dir, f"part-$pid%05d.avro"))
        try it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkSchema.length) {
            val v: AnyRef =
              if (row.isNullAt(i)) null
              else sparkSchema(i).dataType match {
                case BinaryType =>
                  java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
                case _ => row.get(i).asInstanceOf[AnyRef]
              }
            rec.put(sparkSchema(i).name, v)
            i += 1
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }

  /** Decode one OCF's bytes to rows of `schema` (by field name, honoring
    * the file's embedded writer schema). Shared task body of [[read]].
    */
  def decodeFile(bytes: Array[Byte], schema: StructType): Iterator[Row] = {
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    new Iterator[Row] {
      def hasNext: Boolean = { val h = reader.hasNext; if (!h) reader.close(); h }
      def next(): Row = {
        val rec = reader.next()
        Row.fromSeq(schema.fields.toSeq.map { f =>
          rec.get(f.name) match {
            case null => null
            case u: org.apache.avro.util.Utf8 => u.toString
            case bb: java.nio.ByteBuffer =>
              val a = new Array[Byte](bb.remaining()); bb.get(a); a
            case v => v
          }
        })
      }
    }
  }

  /** Distributed read: task-per-file binary scan → decoded rows. */
  def read(spark: SparkSession, glob: String, schema: StructType): DataFrame = {
    val rdd = spark.read.format("binaryFile").load(glob)
      .select(col("content")).rdd
      .flatMap(r => decodeFile(r.getAs[Array[Byte]](0), schema))
    spark.createDataFrame(rdd, schema)
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Dedup
object CCTime {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[cctime] $name%-22s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    Tables.names.foreach(n => Tables.load(spark, dir, n).count())
    val docs = Tables.documents(spark, dir)
    val pairs = t("minhash pairs"){ Dedup.minhashLshPairs(docs, "doc_id","text",2,4,4,0.8).localCheckpoint() }
    println("pairs rows=" + pairs.count())
    val cc = t("connected components"){ Dedup.connectedComponents(pairs).localCheckpoint() }
    val out = t("canonicalize+sort"){ Dedup.canonicalize(docs, "doc_id", pairs).orderBy("doc_id").count() }
    println(out)
    spark.stop()
  }
}

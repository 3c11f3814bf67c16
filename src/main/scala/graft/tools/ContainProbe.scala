package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase-level timing of [[graft.dedup.Dedup.containmentPairs]] on the
  * synthetic probe corpus — scratch diagnosis for the VERDICT r10 #3
  * 9×-variance question. Times each internal stage separately, then the
  * whole op, so the expensive phase is attributable.
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000L)
    val spark = graft.core.GraftSession.builder("contain-probe", cores = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = ScaleProbe.documents(spark, n).localCheckpoint()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tau = 0.9
    // gid construction mirrors Dedup.containmentPairs (Dedup.scala:656)
    // exactly — the \u0001 separator, NOT '|' (r11's probe drifted here)
    val docArr = graft.dedup.Dedup.shingles(df, "doc_id", "text", 2)
      .groupBy("id").agg(array_sort(collect_list(col("shingle"))).as("set"))
      .withColumn("gid", md5(to_binary(concat_ws("\u0001", col("set")), lit("utf-8"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("docArr")(docArr.count())
    val usets = docArr.groupBy("gid").agg(first(col("set")).as("set"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("usets")(usets.count())
    val freq = usets.select(explode(col("set")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("f"))
    t("freq")(freq.count())
    val gsets = usets.select(col("gid"), explode(col("set")).as("sh"))
      .join(freq, "sh")
      .groupBy("gid")
      .agg(transform(array_sort(collect_list(struct(col("f"), col("sh")))),
        x => x("sh")).as("ordered"))
      .withColumn("sz", size(col("ordered")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("gsets")(gsets.count())
    val prefLen = (col("sz") - ceil(lit(tau) * col("sz")) + 1).cast("int")
    val pref = gsets.select(col("gid"), col("sz"),
        posexplode(slice(col("ordered"), lit(1), prefLen)))
      .select(col("gid"), col("sz"), (col("pos") + 1).as("r"), col("col").as("sh"))
    val full = gsets.select(col("gid").as("gb"), explode(col("ordered")).as("sh"))
    val gcands = pref.as("x").join(full.as("y"),
        col("x.sh") === col("y.sh") && col("x.gid") =!= col("y.gb") &&
          lit(1) + (col("x.sz") - col("x.r")) >= ceil(lit(tau) * col("x.sz")))
      .select(col("x.gid").as("ga"), col("y.gb").as("gb")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("gcands")(println("gcands=" + gcands.count()))
    val qual = gcands
      .join(gsets.select(col("gid").as("ga"), col("ordered").as("seta"), col("sz").as("sza")), "ga")
      .join(gsets.select(col("gid").as("gb"), col("ordered").as("setb")), "gb")
      .withColumn("i", size(array_intersect(col("seta"), col("setb"))).cast("double"))
      .withColumn("cont", col("i") / col("sza"))
      .filter(col("cont") >= tau)
    t("qual")(println("qual=" + qual.count()))
    t("full_op")(println("pairs=" +
      graft.dedup.Dedup.containmentPairs(df, "doc_id", "text", 2, 0.9).count()))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches

/** KMV distinct-count sketch: exact below k, bounded error above k, and a
  * plan that only ever moves the 8-byte hashes (TakeOrdered, no full sort).
  */
class SketchesSpec extends SparkTestBase {

  test("kmv is exact when distinct count < k") {
    val df = spark.range(0, 500).select((col("id") % 37).as("k"))
    val row = Sketches.kmvDistinct(df, col("k"), k = 256).collect().head
    assert(row.getLong(0) == 37L)           // k_used = true cardinality
    assert(row.getDouble(2) == 37.0)        // est = exact
  }

  test("kmv estimate is within 4 standard errors when distinct count >> k") {
    val n = 20000L
    val df = spark.range(0, n).select(col("id").as("k"))
    val est = Sketches.kmvDistinct(df, col("k"), k = 256)
      .collect().head.getDouble(2)
    val se = 1.0 / math.sqrt(256 - 2)       // ~6.3% relative
    assert(math.abs(est - n) / n < 4 * se,
      s"estimate $est too far from $n (rel err ${math.abs(est - n) / n})")
  }

  test("per-group kmv: exact below k per group, bounded error above") {
    // group A: 37 distinct (< k, exact); group B: 20000 distinct (estimated)
    val df = spark.range(0, 40000).select(
      when(col("id") < 20000, "A").otherwise("B").as("g"),
      when(col("id") < 20000, col("id") % 37).otherwise(col("id")).as("k"))
    val rows = Sketches.kmvDistinctByGroup(df, "g", col("k"), k = 256)
      .orderBy("g").collect()
    assert(rows(0).getString(0) == "A" && rows(0).getDouble(3) == 37.0)
    val estB = rows(1).getDouble(3)
    val se = 1.0 / math.sqrt(256 - 2)
    assert(math.abs(estB - 20000) / 20000 < 4 * se,
      s"group B estimate $estB too far from 20000")
  }

  test("kmv ignores nulls and hashes deterministically") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("b"), None, Some("a")).toDF("k")
    val row = Sketches.kmvDistinct(df, col("k"), k = 16).collect().head
    assert(row.getLong(0) == 2L && row.getDouble(2) == 2.0)
    // same input -> same sketch bytes (engine-portable determinism)
    val again = Sketches.kmvDistinct(df, col("k"), k = 16).collect().head
    assert(row.getLong(1) == again.getLong(1))
  }

  test("kmv set stats recover a planted overlap within sketch error") {
    import org.apache.spark.sql.functions._
    // A = [0, 30000), B = [20000, 50000) → union 50000, inter 10000, J = 0.2
    val a = spark.range(0, 30000).toDF("k")
    val b = spark.range(20000, 50000).toDF("k")
    val r = graft.functions.Sketches.kmvSetStats(a, col("k"), b, col("k"), k = 512)
      .collect().head
    val (unionEst, jacEst, interEst) =
      (r.getAs[Double]("union_est"), r.getAs[Double]("jaccard_est"),
        r.getAs[Double]("inter_est"))
    // se ≈ 1/sqrt(k-2) ≈ 4.4%; allow 4 se on union, looser on the ratio
    assert(math.abs(unionEst - 50000) / 50000 < 0.18, s"union $unionEst")
    assert(math.abs(jacEst - 0.2) < 0.08, s"jaccard $jacEst")
    assert(math.abs(interEst - 10000) / 10000 < 0.45, s"inter $interEst")
    // exact regime: sketches not filled → exact counts
    val small = graft.functions.Sketches.kmvSetStats(
      spark.range(0, 60).toDF("k"), col("k"),
      spark.range(40, 100).toDF("k"), col("k"), k = 512).collect().head
    assert(small.getAs[Double]("union_est") == 100.0)
    assert(small.getAs[Double]("inter_est") == 20.0)
  }

  test("cms: estimate is an upper bound, exact without collisions, 0 for unseen") {
    import spark.implicits._
    val words = Seq.fill(50)("a") ++ Seq.fill(20)("b") ++ Seq.fill(3)("c")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("i", "k")
    // wide sketch at 3 keys: no collisions -> exact
    val sk = Sketches.cmsBuild(df, col("k"), depth = 4, width = 1024)
    val est = Sketches.cmsEstimate(sk,
        Seq("a", "b", "c", "nope").toDF("q"), col("q"), depth = 4, width = 1024)
      .as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 50L, "b" -> 20L, "c" -> 3L, "nope" -> 0L), s"got $est")
    // brutal width (2 buckets): still an upper bound, total preserved per row
    val sk2 = Sketches.cmsBuild(df, col("k"), depth = 3, width = 2)
    val est2 = Sketches.cmsEstimate(sk2,
        Seq("a", "b", "c").toDF("q"), col("q"), depth = 3, width = 2)
      .as[(String, Long)].collect().toMap
    assert(est2("a") >= 50L && est2("b") >= 20L && est2("c") >= 3L, s"got $est2")
    // every sketch row's counters sum to N (the CMS invariant)
    val rowSums = sk2.groupBy("j").agg(sum("cnt").as("s"))
      .select("s").as[Long].collect()
    assert(rowSums.forall(_ == words.size.toLong), s"got ${rowSums.toSeq}")
  }

  test("cms sketches merge by union + re-sum (distributed combine contract)") {
    import spark.implicits._
    val a = Seq.tabulate(200)(i => (i.toLong, s"k${i % 7}")).toDF("i", "k")
    val b = Seq.tabulate(150)(i => (i.toLong, s"k${i % 5}")).toDF("i", "k")
    val whole = Sketches.cmsBuild(a.union(b), col("k"), depth = 4, width = 64)
    val merged = Sketches.cmsBuild(a, col("k"), depth = 4, width = 64)
      .union(Sketches.cmsBuild(b, col("k"), depth = 4, width = 64))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    val diff = whole.as("w").join(merged.as("m"),
        Seq("j", "bucket"), "full_outer")
      .filter(!(col("w.cnt") <=> col("m.cnt"))).count()
    assert(diff == 0L, "merged partial sketches must equal the whole-data sketch")
  }

  test("quantileSketch: shard bottom-k sets merge losslessly; under-filled is exact") {
    import spark.implicits._
    val rows = (1 to 1000).map(i => (i.toLong, ((i * 137) % 1000 + 1).toDouble))
    val df = rows.toDF("id", "v")
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val global = Sketches.quantileSketch(df, col("id"), col("v"), 64, qs)
      .as[(Double, Double, Long)].collect().toSeq
    // mergeability: per-shard bottom-64 samples, union, re-take 64 — the
    // re-taken set must equal the global bottom-64 (so any quantile read
    // off it matches the global sketch)
    val shardSamples = (0 until 3).map { s =>
      df.filter(col("id") % 3 === s)
        .select(Sketches.hash60(col("id"), "qsk").as("h"), col("v"))
        .orderBy("h", "v").limit(64)
    }.reduce(_ unionByName _)
    val merged = shardSamples.orderBy("h", "v").limit(64)
      .select("h").as[Long].collect().toSeq
    val globalSample = df
      .select(Sketches.hash60(col("id"), "qsk").as("h"), col("v"))
      .orderBy("h", "v").limit(64)
      .select("h").as[Long].collect().toSeq
    assert(merged == globalSample)
    // a sketch larger than the data degrades to EXACT quantiles
    val exact = graft.ops.WindowOps.exactQuantilesGlobal(
        df.select(col("v")), "v", qs)
      .as[(Double, Double)].collect().toMap
    val full = Sketches.quantileSketch(df, col("id"), col("v"), 2048, qs)
      .as[(Double, Double, Long)].collect()
    assert(full.forall { case (q, est, n) => n == 1000L && est == exact(q) })
    // the k=64 estimate is within a sane band of exact (values are 1..1000)
    global.foreach { case (q, est, _) =>
      assert(math.abs(est - exact(q)) < 200, s"q=$q est=$est exact=${exact(q)}")
    }
  }

  test("quantileSketchByGroup: each group equals the global sketch of its slice") {
    import spark.implicits._
    val rows = (1 to 900).map(i =>
      (i.toLong, s"g${i % 3}", ((i * 241) % 500 + 1).toDouble))
    val df = rows.toDF("id", "grp", "v")
    val qs = Seq(0.5, 0.9)
    val byGroup = Sketches.quantileSketchByGroup(df, "grp", col("id"), col("v"),
        k = 32, qs)
      .as[(String, Double, Double, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(byGroup.size == 6)
    for (g <- Seq("g0", "g1", "g2")) {
      val slice = Sketches.quantileSketch(df.filter(col("grp") === g),
          col("id"), col("v"), k = 32, qs)
        .as[(Double, Double, Long)].collect()
      slice.foreach { case (q, est, n) =>
        assert(byGroup((g, q)) == ((est, n)), s"group $g q=$q")
      }
    }
  }

  test("kmv plan is TakeOrdered over hashes, not a global sort") {
    val df = graft.core.Tables.lineitem(spark, sfDir)
    val plan = Sketches.kmvDistinct(df, col("l_partkey"), k = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject (per-partition heap), got:\n$plan")
  }

  // ---- HyperLogLog ---------------------------------------------------------

  test("hll estimate is within 4 standard errors for a large key space") {
    val n = 50000L
    val est = Sketches.hllDistinct(spark.range(0, n).toDF("k"), col("k"))
      .collect().head.getDouble(1)
    val se = 1.04 / math.sqrt(256) // ~6.5% relative (Flajolet 2007)
    assert(math.abs(est - n) / n < 4 * se,
      s"estimate $est too far from $n (rel err ${math.abs(est - n) / n})")
  }

  test("hll small-range branch: near-exact at tiny cardinalities") {
    val df = spark.range(0, 1000).select((col("id") % 3).as("k"))
    val row = Sketches.hllDistinct(df, col("k")).collect().head
    assert(row.getLong(0) == 253L) // 3 filled registers of 256
    assert(math.abs(row.getDouble(1) - 3.0) < 0.05,
      s"linear-counting estimate ${row.getDouble(1)} should be ~3")
  }

  test("hll registers merge by MAX: sketch(A union B) = merge of parts") {
    import spark.implicits._
    val a = spark.range(0, 8000).toDF("k")
    val b = spark.range(5000, 12000).toDF("k") // overlapping slices
    val whole = Sketches.hllRegisters(a.unionByName(b), col("k"))
      .as[(Long, Int)].collect().toMap
    val merged = Sketches.hllRegisters(a, col("k"))
      .unionByName(Sketches.hllRegisters(b, col("k")))
      .groupBy("bucket").agg(max("reg").as("reg"))
      .as[(Long, Int)].collect().toMap
    assert(whole == merged, "per-register max merge must equal whole-corpus sketch")
    // and the estimate read off either register set is identical
    val estWhole = Sketches.hllDistinct(a.unionByName(b), col("k"))
      .collect().head.getDouble(1)
    val estA = Sketches.hllDistinct(a, col("k")).collect().head.getDouble(1)
    assert(estWhole != estA) // sanity: the merge actually changed the sketch
  }

  test("hll: empty input estimates zero; nulls are ignored") {
    import spark.implicits._
    val empty = Sketches.hllDistinct(
      spark.range(0, 10).toDF("k").filter(col("k") < 0), col("k"))
      .collect().head
    assert(empty.getLong(0) == 256L && empty.getDouble(1) == 0.0)
    val withNulls = Seq(Some("x"), None, Some("y"), Some("x")).toDF("k")
    val est = Sketches.hllDistinct(withNulls, col("k")).collect().head.getDouble(1)
    assert(math.abs(est - 2.0) < 0.05, s"expected ~2, got $est")
  }

  test("hll per-group sketches equal the global sketch of each slice") {
    val df = spark.range(0, 30000).select(
      when(col("id") % 2 === 0, "A").otherwise("B").as("g"), col("id").as("k"))
    val grouped = Sketches.hllDistinctByGroup(df, "g", col("k"))
      .orderBy("g").collect()
    for ((g, i) <- Seq("A", "B").zipWithIndex) {
      val solo = Sketches.hllDistinct(df.filter(col("g") === g), col("k"))
        .collect().head
      assert(grouped(i).getLong(1) == solo.getLong(0), s"group $g zero_regs")
      assert(grouped(i).getDouble(2) == solo.getDouble(1), s"group $g est")
    }
  }
}

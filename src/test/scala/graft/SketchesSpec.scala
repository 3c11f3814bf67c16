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

  test("kmv plan is TakeOrdered over hashes, not a global sort") {
    val df = graft.core.Tables.lineitem(spark, sfDir)
    val plan = Sketches.kmvDistinct(df, col("l_partkey"), k = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject (per-partition heap), got:\n$plan")
  }
}

package graft.tools

import graft.SparkEntry

/** Whole-surface plan sweep: builds every declared query's physical plan
  * (pre-execution, AQE initial) at the given fixture scale and reports
  * the ones containing the two operators that can hide a 100×
  * scale-killer — CartesianProduct and BroadcastNestedLoopJoin. BNLJ
  * hits need adjudication (1-row-broadcast crossJoins and the intended
  * ANN brute-force scans plan as BNLJ by design); CartesianProduct hits
  * are presumptively bugs. Complements PlanGuardSpec, which pins the
  * adjudicated subset permanently.
  *
  * Usage: runMain graft.tools.PlanSweep [sfDir]
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.builder("graft-plansweep", cores = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var cart = List.empty[String]
    var bnlj = List.empty[String]
    var failed = List.empty[String]
    for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = q(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) cart ::= name
        if (plan.contains("BroadcastNestedLoopJoin")) bnlj ::= name
      } catch {
        case e: Throwable => failed ::= s"$name: ${e.getClass.getSimpleName}"
      }
    }
    println(s"CARTESIAN (${cart.size}): ${cart.sorted.mkString(", ")}")
    println(s"BNLJ (${bnlj.size}): ${bnlj.sorted.mkString(", ")}")
    println(s"PLAN-FAILED (${failed.size}): ${failed.sorted.mkString(", ")}")
    spark.stop()
  }
}

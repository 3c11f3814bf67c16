package graft.api

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Job parameters — the read-only state every task sees
  * (reference: lib/disco/worker/__init__.py:435-451 `Params`): Disco pickles
  * the object to each worker; the Spark-native carrier is a broadcast
  * variable — shipped once per executor (torrent protocol), not once per
  * task/closure, which is the difference between 1 copy and 10^5 copies of
  * a model table on a 1000-executor cluster.
  */
class Params[T](@transient spark: SparkSession, value: T)(implicit tag: scala.reflect.ClassTag[T])
    extends Serializable {
  private val bc: Broadcast[T] = spark.sparkContext.broadcast(value)
  /** Read from any closure: `params()`. */
  def apply(): T = bc.value
  def destroy(): Unit = bc.destroy()
}

object Params {
  def apply[T: scala.reflect.ClassTag](spark: SparkSession, value: T): Params[T] =
    new Params[T](spark, value)
}

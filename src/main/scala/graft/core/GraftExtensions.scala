package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotPrefix, DotProduct, RollingHash, SqEuclidean}

/** Session extensions: registers graft's native Catalyst expressions as SQL
  * functions (`rolling_hash`, `vec_dot`, `vec_sqdist`, `vec_dot_prefix`),
  * so `spark.sql("SELECT vec_dot(a, b) ...")` plans the same codegen'd
  * expression as the Column API — the SparkSessionExtensions registration
  * path (the other injection points — rules, strategies — are deliberately
  * unused: Catalyst's built-in planning covers this engine's operators).
  *
  * Wire-up: `GraftSession.builder` applies it; external sessions can use
  * `spark.sql.extensions=graft.core.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, arity: Int, make: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity arguments, got ${args.length}")
        make(args)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("rolling_hash", 1, a => RollingHash(a.head)))
    ext.injectFunction(fn("vec_dot", 2, a => DotProduct(a(0), a(1))))
    ext.injectFunction(fn("vec_sqdist", 2, a => SqEuclidean(a(0), a(1))))
    ext.injectFunction(fn("vec_dot_prefix", 2, a => DotPrefix(a(0), a(1))))
  }
}

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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def fn(name: String, arity: Int, make: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity arguments, got ${args.length}")
        make(args)
      })

  private val functions = Seq(
    fn("rolling_hash", 1, a => RollingHash(a.head)),
    fn("nfc_normalize", 1, a => graft.functions.NfcNormalize(a.head)),
    fn("vec_dot", 2, a => DotProduct(a(0), a(1))),
    fn("vec_sqdist", 2, a => SqEuclidean(a(0), a(1))),
    fn("vec_dot_prefix", 2, a => DotPrefix(a(0), a(1))),
    fn("interleave_bits", 3, a => {
      val bits = a(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"interleave_bits: bits must be an integer literal, got $other")
      }
      graft.functions.InterleaveBits(a(0), a(1), bits)
    }))

  /** Post-hoc, idempotent registration into a LIVE session. Needed because
    * `withExtensions` on a builder is silently ignored when `getOrCreate`
    * returns a pre-existing session (shell, notebook, another library's
    * session) — injection only runs at session construction.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = org.apache.spark.sql.graftbridge.functionRegistry(spark)
    functions.foreach { case (ident, info, builder) =>
      reg.registerFunction(ident, info, builder)
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{lit, sqrt}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd folds over `array<double>` pairs — the hot inner loop
  * of every similarity path (cosine re-rank, k-means assignment, IVF probe,
  * LSH signed sums).
  *
  * Spark's higher-order builtins (`zip_with` + `aggregate`) are interpreted
  * per element (lambda eval, boxed intermediates, an allocated zipped
  * array per row pair); these expressions keep the loop inside whole-stage
  * codegen as a primitive `double` accumulation. The fold is the identical
  * fixed left-to-right IEEE-754 order, so every value is bit-for-bit what
  * the `aggregate(zip_with(...))` formulation produced — the DuckDB oracles
  * (list_reduce, same order) keep matching unchanged.
  *
  * Null contract (same as the zip_with form): null array → null; length
  * mismatch → null (zip_with pads with null, poisoning the sum); null
  * element → null.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Java source for one term given element expressions x, y. */
  protected def term(x: String, y: String): String
  protected def termEval(x: Double, y: Double): Double
  protected def name: String

  /** Whether right may be LONGER than left (prefix fold) — used by the
    * LSH signed dot where the sign table is a fixed-capacity literal.
    */
  protected def prefix: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$name needs (array<double>, array<double>), got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (if (prefix) b.numElements() < n else b.numElements() != n) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += termEval(a.getDouble(i), b.getDouble(i))
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val lenBad =
        if (prefix) s"$r.numElements() < $n" else s"$r.numElements() != $n"
      s"""
         |int $n = $l.numElements();
         |if ($lenBad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${term(s"$l.getDouble($i)", s"$r.getDouble($i)")};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

/** Σ xᵢ·yᵢ — lengths must match. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  protected def term(x: String, y: String): String = s"$x * $y"
  protected def termEval(x: Double, y: Double): Double = x * y
  protected def name = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ (xᵢ-yᵢ)² — lengths must match. */
case class SqEuclidean(left: Expression, right: Expression) extends VectorFold {
  protected def term(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  protected def termEval(x: Double, y: Double): Double = (x - y) * (x - y)
  protected def name = "vec_sqdist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ xᵢ·yᵢ over left's length; right may be longer (a fixed-capacity
  * constant table, e.g. precomputed LSH plane signs).
  */
case class DotPrefix(left: Expression, right: Expression) extends VectorFold {
  protected def term(x: String, y: String): String = s"$x * $y"
  protected def termEval(x: Double, y: Double): Double = x * y
  protected def name = "vec_dot_prefix"
  override protected def prefix = true
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorOps {
  def vec_dot(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))

  def vec_sqdist(a: Column, b: Column): Column =
    toColumn(SqEuclidean(toExpression(a), toExpression(b)))

  def vec_dot_prefix(a: Column, b: Column): Column =
    toColumn(DotPrefix(toExpression(a), toExpression(b)))

  /** ‖v‖ — precompute ONCE per vector before a join so each candidate pair
    * costs one dot instead of three (sim = dot / (‖a‖·‖b‖), identical IEEE
    * value to computing the norms pair-side).
    */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Driver-side ±1 plane sign for (table t, plane j, dim d) — the exact
    * value of the SQL `md5('t:j_d')` first-hex-digit rule in
    * [[graft.similarity.Similarity]] (the DuckDB oracles replicate it), so
    * sign tables can be baked as literals instead of re-hashing per
    * element per row.
    */
  def planeSign(t: Int, j: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$t:${j}_$d".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }

  /** Literal sign table for plane (t, j): capacity `maxDim` doubles. */
  def planeSigns(t: Int, j: Int, maxDim: Int): Column =
    lit((0 until maxDim).map(planeSign(t, j, _)).toArray)
}

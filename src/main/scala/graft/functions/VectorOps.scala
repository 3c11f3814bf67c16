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

/** All `bits` signed-projection sign bits packed into ONE int64 in ONE
  * loop: `right` is a flattened plane-major sign table (bits × stride
  * doubles, stride = capacity), and bit j of the result is set iff
  * Σ_d left[d] · right[j·stride + d] > 0 — per plane the identical fixed
  * left-to-right IEEE fold as [[DotPrefix]], so buckets are bit-for-bit
  * what the per-plane `when(vec_dot_prefix(...) > 0, 1<<j)` sum produced
  * (and the DuckDB oracles keep matching unchanged).
  *
  * Why one expression: `bits` separate DotPrefix folds each drag their own
  * capacity-sized literal into the generated projection — at 48 planes the
  * method outgrows what the JIT will compile and the stage runs
  * interpreted (measured 7× the 6-bit cost at 8× the planes). This form is
  * two small loops and ONE shared literal: cost bits·dim multiplies,
  * codegen stays compilable at any plane count.
  *
  * Null contract (matches the when-sum form): null vector → null; a null
  * VECTOR element made every plane's dot null, which the when-sum read as
  * bit 0 — so here the code is 0. A null SIGN element nulls only that
  * plane's dot → that plane's bit is 0; the scan for it is emitted only
  * when the table's static type admits nulls (internal tables are typed
  * containsNull=false, so their loop carries no checks). Vector longer
  * than the table's stride → null (callers guard loudly first —
  * [[graft.similarity.Similarity.lshBucket]] raises before this
  * evaluates).
  */
case class SignPack(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _))
        if bits >= 1 && bits <= 62 => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_sign_pack needs (array<double>, array<double>) and bits in [1,62], got ($l, $r, bits=$bits)")
    }

  /** Null signs only need scanning when the STATIC type admits them —
    * the internal tables ([[VectorOps.planeSignsFlat]]) are typed
    * containsNull=false, so their hot loop carries zero null checks;
    * a user-supplied nullable table gets the per-plane scan below
    * (a null sign element nulls that plane's dot → bit 0, exactly what
    * the per-plane `when(vec_dot_prefix > 0, …)` form produced).
    */
  // lazy: right.dataType on an UNRESOLVED child (the public Column API
  // over a user table column) must not throw at construction time
  private lazy val signsNullable: Boolean =
    right.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val signs = r.asInstanceOf[ArrayData]
    val n = v.numElements()
    val stride = signs.numElements() / bits
    if (n > stride) null
    else {
      var code = 0L
      var nullElem = false
      var d = 0
      while (d < n && !nullElem) { nullElem = v.isNullAt(d); d += 1 }
      if (!nullElem) {
        var j = 0
        while (j < bits) {
          var s = 0.0
          var planeNull = false
          val off = j * stride
          var i = 0
          while (i < n && !planeNull) {
            if (signsNullable && signs.isNullAt(off + i)) planeNull = true
            else { s += v.getDouble(i) * signs.getDouble(off + i); i += 1 }
          }
          if (!planeNull && s > 0) code |= 1L << j
          j += 1
        }
      }
      code
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val stride = ctx.freshName("stride")
      val code = ctx.freshName("code")
      val nullElem = ctx.freshName("nullElem")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      s"""
         |int $n = $l.numElements();
         |int $stride = $r.numElements() / $bits;
         |if ($n > $stride) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $code = 0L;
         |  boolean $nullElem = false;
         |  for (int $d = 0; $d < $n && !$nullElem; $d++) $nullElem = $l.isNullAt($d);
         |  if (!$nullElem) {
         |    ${if (signsNullable) {
                val pn = ctx.freshName("planeNull")
                s"""for (int $j = 0; $j < $bits; $j++) {
         |      double $s = 0.0;
         |      boolean $pn = false;
         |      int $off = $j * $stride;
         |      for (int $d = 0; $d < $n && !$pn; $d++) {
         |        if ($r.isNullAt($off + $d)) $pn = true;
         |        else $s += $l.getDouble($d) * $r.getDouble($off + $d);
         |      }
         |      if (!$pn && $s > 0) $code |= 1L << $j;
         |    }"""
              } else {
                s"""for (int $j = 0; $j < $bits; $j++) {
         |      double $s = 0.0;
         |      int $off = $j * $stride;
         |      for (int $d = 0; $d < $n; $d++) {
         |        $s += $l.getDouble($d) * $r.getDouble($off + $d);
         |      }
         |      if ($s > 0) $code |= 1L << $j;
         |    }"""
              }}
         |  }
         |  ${ev.value} = $code;
         |}
       """.stripMargin
    })

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

  /** A null-free-TYPED array<double> literal (containsNull = false):
    * `lit(Array[Double])` types its array nullable, which would force
    * [[SignPack]]'s per-plane null-scan codegen onto a table that can
    * never hold a null — stating the truth statically keeps the hot
    * loop check-free.
    */
  private def nullFreeLit(a: Array[Double]): Column =
    toColumn(org.apache.spark.sql.catalyst.expressions.Literal.create(
      a, ArrayType(DoubleType, containsNull = false)))

  /** Literal sign table for plane (t, j): capacity `maxDim` doubles. */
  def planeSigns(t: Int, j: Int, maxDim: Int): Column =
    nullFreeLit((0 until maxDim).map(planeSign(t, j, _)).toArray)

  /** Flattened plane-major sign table for table `t`: `bits` × `maxDim`
    * doubles, plane j at offset j·maxDim — the one-literal layout
    * [[vec_sign_pack]] walks.
    */
  def planeSignsFlat(t: Int, bits: Int, maxDim: Int): Column =
    nullFreeLit((0 until bits).flatMap(j =>
      (0 until maxDim).map(d => planeSign(t, j, d))).toArray)

  /** All `bits` sign bits of `a` against the flattened table `signs` in
    * one codegen'd loop — see [[SignPack]].
    */
  def vec_sign_pack(a: Column, signs: Column, bits: Int): Column =
    toColumn(SignPack(toExpression(a), toExpression(signs), bits))
}

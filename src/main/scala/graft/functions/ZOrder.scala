package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleave of the low `bits` bits of two long
  * columns: result bit 2i = x bit i, bit 2i+1 = y bit i. Sorting by the
  * interleaved value clusters rows that are close in BOTH dimensions into
  * the same neighborhood — the multi-column data-layout trick behind
  * file-skipping (each contiguous z-range covers a bounded rectangle of
  * the key space, so per-file min/max stats prune scans on EITHER
  * predicate column, where a lexicographic sort only prunes the leading
  * one).
  *
  * Native Catalyst expression with `doGenCode` (same rationale as
  * [[RollingHash]]): the interleave stays inside whole-stage codegen at
  * scan speed. Callers bucket/normalize each dimension into [0, 2^bits)
  * first at real scale (e.g. per-column range-partition ids); values wider
  * than `bits` alias by masking. The fold is engine-portable — the oracle
  * replays it as a DuckDB `list_sum(list_transform(range(bits), …))`.
  */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"z-order bits must be in [1, 31]: $bits")

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"interleave_bits needs (BIGINT, BIGINT), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(x: Any, y: Any): Any = {
    val a = x.asInstanceOf[Long]; val b = y.asInstanceOf[Long]
    var z = 0L; var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >>> $i) & 1L) << (2 * $i);
         |  $z |= (($b >>> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

/** N-ary Morton interleave: result bit (i·n + j) = column j's bit i — the
  * [[InterleaveBits]] generalization for layouts clustering on three or
  * more predicate columns (date × customer × product). Total bits n·bits
  * must fit a long (≤ 63).
  */
case class InterleaveBitsN(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.size >= 2, s"interleave needs >= 2 columns")
  require(bits >= 1 && bits * children.size <= 63,
    s"${children.size} cols x $bits bits exceeds a long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def checkInputDataTypes() =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"interleave needs BIGINT columns, got ${children.map(_.dataType)}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.size
    var z = 0L
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      val a = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        z |= ((a >>> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    // short-circuit-free null fold: the bit work is cheap and the code
    // stays straight-line (codegen-friendly)
    val perChild = evals.zipWithIndex.map { case (e, j) =>
      val i = ctx.freshName("i")
      code"""
        ${e.code}
        if (${e.isNull}) { ${ev.isNull} = true; } else {
          for (int $i = 0; $i < $bits; $i++) {
            $z |= ((${e.value} >>> $i) & 1L) << ($i * $n + $j);
          }
        }
      """
    }.reduce(_ + _)
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        long $z = 0L;
        $perChild
        long ${ev.value} = $z;
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBitsN =
    copy(children = newChildren)
}

object ZOrder {
  /** Column entry point: `z_order(x, y, bits)` — Morton code of the two
    * columns' low `bits` bits.
    */
  def z_order(x: Column, y: Column, bits: Int): Column =
    toColumn(InterleaveBits(toExpression(x.cast("long")),
      toExpression(y.cast("long")), bits))

  /** N-ary Morton code of the columns' low `bits` bits each. */
  def z_order_n(bits: Int, cols: Column*): Column =
    toColumn(InterleaveBitsN(cols.map(c => toExpression(c.cast("long"))), bits))

  /** The matching DuckDB fold, for oracle SQL construction. */
  def zOrderSql(x: String, y: String, bits: Int): String =
    s"CAST(list_sum(list_transform(range(0, $bits), i -> " +
      s"((($x >> i) & 1) << (2*i)) + ((($y >> i) & 1) << (2*i+1)))) AS BIGINT)"

  /** N-ary DuckDB fold matching [[InterleaveBitsN]]. */
  def zOrderSqlN(bits: Int, cols: Seq[String]): String = {
    val n = cols.size
    cols.zipWithIndex.map { case (c, j) =>
      s"list_sum(list_transform(range(0, $bits), i -> (($c >> i) & 1) << ($n*i + $j)))"
    }.mkString("CAST(", " + ", " AS BIGINT)")
  }
}

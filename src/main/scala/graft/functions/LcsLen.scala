package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Longest-common-subsequence length over two token arrays — the ROUGE-L
  * kernel (Lin 2004 §3). Classic O(n·m) DP in O(m) space, kept inside
  * whole-stage codegen as a primitive int table: per pair this is
  * row-local work at the scan, the wordcount profile with a
  * token-length² constant (the levenshtein/chrF family).
  *
  * The DuckDB oracles replay the identical recurrence through a recursive
  * CTE using the prefix-max form — new[j] = max(old[j],
  * max_{l≤j}(old[l−1] + eq(l))) — which is equal to the textbook
  * three-way DP because unrolling new[j−1] contributes only dominated
  * terms; integer DP, so cross-engine equality is exact.
  *
  * Null contract (the [[VectorFold]] convention): null array → null;
  * null ELEMENT → null. Empty side → 0.
  */
case class LcsLen(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lcs_len needs (array<string>, array<string>), got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    var j = 0
    while (j < m) { if (b.isNullAt(j)) return null; j += 1 }
    val dp = new Array[Int](m + 1)
    i = 0
    while (i < n) {
      val ai = a.getUTF8String(i)
      var diag = 0
      j = 1
      while (j <= m) {
        val tmp = dp(j)
        dp(j) =
          if (ai.equals(b.getUTF8String(j - 1))) diag + 1
          else math.max(dp(j), dp(j - 1))
        diag = tmp
        j += 1
      }
      i += 1
    }
    dp(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dp = ctx.freshName("dp")
      val diag = ctx.freshName("diag")
      val tmp = ctx.freshName("tmp")
      val ai = ctx.freshName("ai")
      s"""
         |int $n = $l.numElements();
         |int $m = $r.numElements();
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++)
         |  if ($l.isNullAt($i)) ${ev.isNull} = true;
         |for (int $j = 0; $j < $m && !${ev.isNull}; $j++)
         |  if ($r.isNullAt($j)) ${ev.isNull} = true;
         |if (!${ev.isNull}) {
         |  int[] $dp = new int[$m + 1];
         |  for (int $i = 0; $i < $n; $i++) {
         |    org.apache.spark.unsafe.types.UTF8String $ai = $l.getUTF8String($i);
         |    int $diag = 0;
         |    for (int $j = 1; $j <= $m; $j++) {
         |      int $tmp = $dp[$j];
         |      if ($ai.equals($r.getUTF8String($j - 1))) {
         |        $dp[$j] = $diag + 1;
         |      } else {
         |        $dp[$j] = Math.max($dp[$j], $dp[$j - 1]);
         |      }
         |      $diag = $tmp;
         |    }
         |  }
         |  ${ev.value} = $dp[$m];
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object LcsLen {
  /** LCS length of two `array<string>` columns — see [[LcsLen]]. */
  def lcs_len(a: Column, b: Column): Column =
    toColumn(LcsLen(toExpression(a), toExpression(b)))
}

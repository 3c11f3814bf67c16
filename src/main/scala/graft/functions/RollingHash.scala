package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's Unicode code points:
  * `h = (h * 31 + cp) mod (2^31 - 1)` — the document-fingerprinting
  * primitive (rolling hash) from the LLM-pipeline extension surface.
  *
  * Implemented as a native Catalyst expression WITH codegen (`doGenCode`)
  * rather than a Scala UDF: stays inside whole-stage codegen, no
  * serialization boundary, null-safe for free via `UnaryExpression`.
  * The recurrence is engine-portable: DuckDB expresses the identical fold as
  * `list_reduce(list_transform(string_split_regex(s, ''), c -> unicode(c)),
  * (a, b) -> (a * 31 + b) % 2147483647)` which the oracle uses.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  private val Mod = 2147483647L // 2^31 - 1

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash needs STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % ${Mod}L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column-level entry point: `rolling_hash(col)`. */
  def rolling_hash(c: Column): Column =
    toColumn(RollingHash(toExpression(c)))
}

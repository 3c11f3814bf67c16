package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the first
  * step of every text-ingestion pipeline (decomposed sequences like
  * `e + U+0301` become the canonical composed `é`, so downstream hashing,
  * dedup shingles, and tokenizers see ONE representation of equal text).
  *
  * A codegen'd `UnaryExpression` (not a UDF) for the usual reasons: stays
  * inside whole-stage codegen, no serialization boundary, null-safe via
  * the base class. The JVM's `java.text.Normalizer` implements UAX #15 —
  * the identical public algorithm DuckDB's `nfc_normalize` implements, so
  * the oracle replays this cross-engine (spec-pinned on planted
  * decomposed/composed pairs).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation for
  * already-NFC text (the overwhelming majority of a real corpus), and we
  * return the INPUT UTF8String untouched in that case.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object UnicodeNorm {
  /** Column-level entry point: `nfc_normalize(col)`. */
  def nfc_normalize(c: Column): Column =
    toColumn(NfcNormalize(toExpression(c)))
}

package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Direct-compile pins for EVERY custom `doGenCode` expression — the r15
  * SignPack lesson generalized: `GenerateMutableProjection.generate`
  * compiles the generated Java immediately and THROWS on a Janino error,
  * whereas the query path silently falls back to the interpreted eval
  * and can hide a broken template (an unbalanced brace cost SignPack its
  * JIT for a full round) indefinitely. One pin per expression: the
  * template must compile AND agree with the interpreted eval on a
  * non-trivial value plus the null/guard branches.
  */
class CodegenPinSpec extends SparkTestBase {

  /** Compile `e` directly (throws on any codegen error), project it, and
    * assert the compiled value equals the interpreted eval.
    */
  private def compiled(e: Expression): Any = {
    val row = GenerateMutableProjection.generate(Seq(e))(InternalRow.apply())
    val interp = e.eval(InternalRow.apply())
    val got =
      if (row.isNullAt(0)) null
      else e.dataType match {
        case LongType    => row.getLong(0)
        case IntegerType => row.getInt(0)
        case DoubleType  => row.getDouble(0)
        case StringType  => row.getUTF8String(0)
        case other       => fail(s"unhandled pin type $other")
      }
    assert(got == interp, s"codegen $got != interpreted $interp for $e")
    got
  }

  private def arr(xs: Seq[Double], containsNull: Boolean = false) =
    Literal.create(xs, ArrayType(DoubleType, containsNull))
  private def sarr(xs: Seq[String]) =
    Literal.create(xs, ArrayType(StringType, false))
  private def str(s: String) =
    Literal.create(UTF8String.fromString(s), StringType)

  test("vec_dot / vec_sqdist / vec_dot_prefix compile; fold values + length and null-element guards") {
    import graft.functions.{DotPrefix, DotProduct, SqEuclidean}
    assert(compiled(DotProduct(arr(Seq(1.0, 2.0, 3.0)),
      arr(Seq(4.0, 5.0, 6.0)))) == 32.0)
    assert(compiled(DotProduct(arr(Seq(1.0)), arr(Seq(1.0, 2.0)))) == null,
      "length mismatch -> null")
    assert(compiled(SqEuclidean(arr(Seq(1.0, 2.0)), arr(Seq(4.0, 6.0)))) == 25.0)
    assert(compiled(DotPrefix(arr(Seq(1.0, 2.0)),
      arr(Seq(3.0, 4.0, 99.0)))) == 11.0,
      "prefix fold reads left's length only")
    assert(compiled(DotPrefix(arr(Seq(1.0, 2.0, 3.0)), arr(Seq(1.0)))) == null,
      "right shorter than left -> null")
    val withNull = Literal.create(Seq[java.lang.Double](1.0, null),
      ArrayType(DoubleType, true))
    assert(compiled(DotProduct(withNull,
      arr(Seq(1.0, 2.0), containsNull = true))) == null,
      "null element -> null (the VectorFold convention)")
  }

  test("lcs_len compiles; DP value, empty side, null element") {
    import graft.functions.LcsLen
    assert(compiled(LcsLen(sarr(Seq("a", "b", "c", "d")),
      sarr(Seq("b", "d", "e")))) == 2)
    assert(compiled(LcsLen(sarr(Nil), sarr(Seq("x")))) == 0)
    val nullElem = Literal.create(Seq[String]("a", null),
      ArrayType(StringType, true))
    assert(compiled(LcsLen(nullElem, sarr(Seq("a")))) == null)
  }

  test("rolling_hash compiles; code-point fold incl. an astral pair, empty string") {
    import graft.functions.RollingHash
    assert(compiled(RollingHash(str("abc"))) ==
      (('a' * 31L + 'b') * 31 + 'c') % 2147483647L)
    compiled(RollingHash(str("née 😀"))) // astral cp: ONE fold step
    assert(compiled(RollingHash(str(""))) == 0L)
  }

  test("nfc_normalize compiles; composes decomposed text, identity fast path") {
    import graft.functions.NfcNormalize
    assert(compiled(NfcNormalize(str("café"))).toString == "café")
    assert(compiled(NfcNormalize(str("plain"))).toString == "plain")
  }

  test("interleave_bits (2-col and N-col) compiles; bit placement + null child") {
    import graft.functions.{InterleaveBits, InterleaveBitsN}
    // a=0b11, b=0b01 at 2 bits: bit0=a0, bit1=b0, bit2=a1, bit3=b1 -> 0b0111
    assert(compiled(InterleaveBits(Literal(3L), Literal(1L), 2)) == 7L)
    assert(compiled(InterleaveBitsN(
      Seq(Literal(1L), Literal(1L), Literal(1L)), 1)) == 7L)
    assert(compiled(InterleaveBitsN(
      Seq(Literal(1L), Literal.create(null, LongType), Literal(1L)), 1)) == null)
  }
}

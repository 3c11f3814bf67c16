package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps._

class VectorOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head().get(0)

  test("vec_dot / vec_sqdist match the zip_with+aggregate fold bit-for-bit") {
    val a = Array(0.1, -2.5, 3.75, 1e-9, 17.0)
    val b = Array(4.0, 0.3, -1.25, 2.0, 1e9)
    val oldDot = one(aggregate(zip_with(lit(a), lit(b), (p, q) => p * q),
      lit(0.0), (acc, v) => acc + v))
    assert(one(vec_dot(lit(a), lit(b))) == oldDot)
    val oldSq = one(aggregate(zip_with(lit(a), lit(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))
    assert(one(vec_sqdist(lit(a), lit(b))) == oldSq)
  }

  test("null contract: length mismatch and null element both yield null") {
    assert(one(vec_dot(lit(Array(1.0, 2.0)), lit(Array(1.0)))) == null)
    val withNull = array(lit(1.0), lit(null).cast("double"))
    assert(one(vec_dot(lit(Array(1.0, 2.0)), withNull)) == null)
    // prefix variant: longer right is fine, shorter right is null
    assert(one(vec_dot_prefix(lit(Array(1.0, 2.0)),
      lit(Array(3.0, 4.0, 99.0)))) == 11.0)
    assert(one(vec_dot_prefix(lit(Array(1.0, 2.0)), lit(Array(3.0)))) == null)
  }

  test("interpreted eval agrees with codegen") {
    // codegen path (whole-stage over a row-backed column) ...
    val df = Seq((Array(1.5, 2.5), Array(2.0, -1.0))).toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).head().getDouble(0) == 0.5)
    assert(df.select(vec_sqdist(col("a"), col("b"))).head().getDouble(0)
      == (0.25 + 12.25))
    // ... vs the interpreted path (Expression.eval called directly — the
    // codegen-fallback route), including the null contracts
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def arr(xs: Any*) = Literal.create(xs, ArrayType(DoubleType))
    assert(graft.functions.DotProduct(arr(1.5, 2.5), arr(2.0, -1.0))
      .eval(null) == 0.5)
    assert(graft.functions.SqEuclidean(arr(1.5, 2.5), arr(2.0, -1.0))
      .eval(null) == 12.5)
    assert(graft.functions.DotProduct(arr(1.0, 2.0), arr(1.0)).eval(null) == null)
    assert(graft.functions.DotProduct(arr(1.0, 2.0), arr(1.0, null)).eval(null) == null)
    assert(graft.functions.DotPrefix(arr(1.0, 2.0), arr(3.0, 4.0, 99.0))
      .eval(null) == 11.0)
    assert(graft.functions.DotPrefix(arr(1.0, 2.0), arr(3.0)).eval(null) == null)
  }

  test("nfc_normalize: composes decomposed sequences, identity on NFC text, null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val composed = "caf\u00e9" // one code point
    val decomposed = "cafe\u0301" // e + combining acute
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"),
        (4L, null.asInstanceOf[String]),
        (5L, "A\u030angstro\u0308m")) // decomposed ring/diaeresis
      .toDF("id", "t")
      .select(col("id"),
        graft.functions.UnicodeNorm.nfc_normalize(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(df(1L) == composed, "decomposed must compose")
    assert(df(2L) == composed, "already-NFC text is untouched")
    assert(df(3L) == "plain ascii")
    assert(df(4L) == null)
    assert(df(5L) == "\u00c5ngstr\u00f6m")
    // SQL registration via extensions
    val viaSql = spark.sql("SELECT nfc_normalize('cafe\u0301')").head.getString(0)
    assert(viaSql == composed)
    // idempotent
    val twice = Seq(decomposed).toDF("t")
      .select(graft.functions.UnicodeNorm.nfc_normalize(
        graft.functions.UnicodeNorm.nfc_normalize(col("t"))))
      .head.getString(0)
    assert(twice == composed)
  }

  test("normalizeText: NFC + control strip + whitespace collapse, exact accounting") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ok text"),
      (2L, "cafe\u0301 con leche"), // 15 raw chars -> 14 clean
      (3L, "bad\u0007\u001fbytes"), // controls stripped, no space
      (4L, "  spaced\t\tout \n "),
      (5L, "")).toDF("doc_id", "t")
    val got = graft.ops.TextOps.normalizeText(docs, "doc_id", "t")
      .as[(Long, Long, Long, Boolean, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 7L, 7L, false, "ok text")))
    assert(got(2L) == ((2L, 15L, 14L, true, "caf\u00e9 con leche")))
    assert(got(3L) == ((3L, 10L, 8L, true, "badbytes")))
    assert(got(4L) == ((4L, 16L, 10L, true, "spaced out")))
    assert(got(5L) == ((5L, 0L, 0L, false, "")))
  }

  test("lshBucket: null vector gets a null bucket, not an error") {
    val df = Seq(Tuple1(Option.empty[Array[Double]]),
      Tuple1(Some(Array(1.0, -2.0)))).toDF("v")
    val buckets = df.select(
      graft.similarity.Similarity.lshBucket(col("v"), 4, 0).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(buckets.count(_.isEmpty) == 1 && buckets.count(_.isDefined) == 1)
  }

  test("driver-side planeSign equals the SQL md5 first-hex-digit rule") {
    val sql = Seq(1).toDF("x").select(
      (0 until 32).map { d =>
        when(substring(md5(to_binary(lit(s"2:5_$d"), lit("utf-8"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1.0).otherwise(-1.0)
          .as(s"s$d")
      }: _*).head().toSeq
    val drv = (0 until 32).map(d => planeSign(2, 5, d))
    assert(sql == drv)
  }

  test("extensions register the native expressions as SQL functions") {
    assert(spark.sql("SELECT rolling_hash('abc')").head().getLong(0)
      == Seq("abc").toDF("s")
        .select(graft.functions.RollingHash.rolling_hash(col("s")))
        .head().getLong(0))
    assert(spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0) == 11.0)
    assert(spark.sql(
      "SELECT vec_sqdist(array(1.0d), array(3.0d))").head().getDouble(0) == 4.0)
    assert(spark.sql("SELECT interleave_bits(5L, 3L, 3)").head().getLong(0)
      == 27L)
    // non-literal bits argument fails loudly, not silently
    intercept[Exception] {
      spark.sql("SELECT interleave_bits(5L, 3L, CAST(rand()*4 AS INT))").collect()
    }
    // post-hoc registration into a live session is idempotent and
    // equivalent (the path for sessions getOrCreate'd without extensions)
    graft.core.GraftExtensions.register(spark)
    assert(spark.sql(
      "SELECT vec_dot(array(2.0d), array(3.0d))").head().getDouble(0) == 6.0)
  }

  test("SQL-first usage: registered table views + graft SQL functions") {
    graft.core.Tables.registerAll(spark, sfDir)
    // a pure-SQL user story: tag-name resolution (views) + custom codegen
    // function, no Column API anywhere
    val row = spark.sql(
      """SELECT count(DISTINCT rolling_hash(text)) AS n_fp,
        |       count(*) AS n_docs
        |FROM documents""".stripMargin).head()
    assert(row.getLong(1) > 0 && row.getLong(0) <= row.getLong(1))
    val dot = spark.sql(
      "SELECT vec_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) FROM embeddings LIMIT 1")
      .head().getDouble(0)
    assert(dot > 0.0)
  }

  test("lshBucket fails loudly past the sign-table capacity") {
    val big = Seq(Tuple1(Array.fill(9)(1.0))).toDF("v")
    val e = intercept[Exception] {
      big.select(graft.similarity.Similarity.lshBucket(col("v"), 4, 0, maxDim = 8))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("vec_sign_pack equals the per-plane prefix-dot formulation bit-for-bit") {
    import graft.functions.VectorOps._
    // random-ish vectors including negatives and a zero-sum plane candidate
    val vecs = (0 until 50).map(i =>
      Tuple1((0 until 24).map(d => ((i * 31 + d * 7) % 13 - 6).toDouble).toArray))
    val df = vecs.toDF("v")
    for (bits <- Seq(4, 16, 48); t <- Seq(0, 1)) {
      val packed = df.select(
        vec_sign_pack(col("v"), planeSignsFlat(t, bits, 64), bits).as("c"))
        .collect().map(_.getLong(0))
      val perPlane = df.select((0 until bits).map { j =>
          when(vec_dot_prefix(col("v"), planeSigns(t, j, 64)) > 0, 1L << j)
            .otherwise(0L)
        }.reduce(_ + _).as("c")).collect().map(_.getLong(0))
      assert(packed.toSeq == perPlane.toSeq, s"bits=$bits table=$t")
    }
    // null element -> code 0 (every plane's dot was null -> bit 0)
    val withNull = Seq(Tuple1(Array[java.lang.Double](1.0, null, 2.0))).toDF("v")
    val c = withNull.select(vec_sign_pack(col("v").cast("array<double>"),
      planeSignsFlat(0, 8, 16), 8)).collect()(0)
    assert(!c.isNullAt(0) && c.getLong(0) == 0L)
    // over-capacity -> null (callers raise first via the size guard)
    val over = Seq(Tuple1(Array.fill(20)(1.0))).toDF("v")
    val o = over.select(vec_sign_pack(col("v"), planeSignsFlat(0, 4, 16), 4))
      .collect()(0)
    assert(o.isNullAt(0))
  }

  test("vec_sign_pack: a null SIGN element zeroes that plane's bit only") {
    import graft.functions.VectorOps._
    // user-supplied nullable table (2 planes × stride 2): plane 0 has a
    // null sign -> its dot is null -> bit 0 = 0 (the when-sum contract);
    // plane 1 is intact -> its bit still computes
    val df = Seq(Tuple1(Array(1.0, 2.0))).toDF("v")
    val signs = lit(Array[java.lang.Double](1.0, null, 1.0, 1.0))
      .cast("array<double>")
    val got = df.select(vec_sign_pack(col("v"), signs, 2)).collect()(0)
    assert(!got.isNullAt(0) && got.getLong(0) == 2L, got.toString)
    // internal tables are TYPED null-free so the hot loop stays check-free
    import org.apache.spark.sql.types.ArrayType
    assert(!df.select(planeSignsFlat(0, 4, 16).as("s"))
      .schema("s").dataType.asInstanceOf[ArrayType].containsNull)
  }

  test("SignPack doGenCode COMPILES for both null-scan branches (no silent fallback)") {
    // Generate*.generate compiles the template directly — a Janino error
    // THROWS here, whereas the query path silently falls back to the
    // interpreted eval and hides an unbalanced-brace template (the r15
    // regression this pins)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val vec = Literal.create(Seq(1.0, -2.0), ArrayType(DoubleType, false))
    for (containsNull <- Seq(false, true)) {
      // plane 0: 1·1 + (−2)·(−1) = 3 > 0 → bit 0; plane 1: 1 − 2 < 0
      val signs = Literal.create(Seq(1.0, -1.0, 1.0, 1.0),
        ArrayType(DoubleType, containsNull))
      val e = graft.functions.SignPack(vec, signs, 2)
      val proj = GenerateMutableProjection.generate(Seq(e))
      val row = proj(InternalRow.apply())
      assert(!row.isNullAt(0) && row.getLong(0) == 1L &&
        row.getLong(0) == e.eval(InternalRow.apply()).asInstanceOf[Long],
        s"containsNull=$containsNull")
    }
    // the null-vector guard path: numElements > stride -> null, both modes
    val over = Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType, false))
    val signs1 = Literal.create(Seq(1.0, 1.0), ArrayType(DoubleType, false))
    val e2 = graft.functions.SignPack(over, signs1, 2)
    val p2 = GenerateMutableProjection.generate(Seq(e2))
    assert(p2(InternalRow.apply()).isNullAt(0))
  }
}

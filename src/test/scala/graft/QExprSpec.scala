package graft

import graft.query.QExpr
import graft.query.QExpr._

class QExprSpec extends SparkTestBase {

  test("parser: precedence ~ > & > |") {
    assert(parse("a | b & c") == Or(Lit("a"), And(Lit("b"), Lit("c"))))
    assert(parse("~a & b") == And(Not(Lit("a")), Lit("b")))
    assert(parse("(a | b) & ~c") == And(Or(Lit("a"), Lit("b")), Not(Lit("c"))))
    assert(parse("this | word") == Or(Lit("this"), Lit("word")))
  }

  test("parser: rejects malformed input") {
    intercept[IllegalArgumentException](parse("(a | b"))
    intercept[IllegalArgumentException](parse("& a"))
  }

  test("parser: rejects trailing input instead of silently truncating") {
    // each of these used to parse as a SHORTER query with no error
    intercept[IllegalArgumentException](parse("data model")) // meant data & model
    intercept[IllegalArgumentException](parse("a ~b"))
    intercept[IllegalArgumentException](parse("a | b) & c"))
  }

  test("set predicate selects docs by CNF over key sets") {
    import spark.implicits._
    val df = Seq(
      (1, Seq("a", "b")), (2, Seq("a", "c")), (3, Seq("b", "c")), (4, Seq("c"))
    ).toDF("id", "keys")
    val got = df.filter(setPredicate(parse("(a | b) & ~c"), df("keys")))
      .select("id").as[Int].collect().sorted
    assert(got.sameElements(Array(1)))
  }

  test("lookup returns exploded values of matching keys") {
    import spark.implicits._
    val kv = Seq(("a", "1"), ("a", "2"), ("b", "3"), ("c", "4")).toDF("k", "v")
    val idx = build(kv, "k", "v")
    val got = lookup(idx, parse("a | c")).as[(String, String)].collect().sorted
    assert(got.sameElements(Array(("a", "1"), ("a", "2"), ("c", "4"))))
  }

  test("iteration surface: keys/values/items/uniqueValues") {
    import spark.implicits._
    val idx = build(Seq(("a", "1"), ("a", "2"), ("b", "2")).toDF("k", "v"), "k", "v")
    assert(keys(idx).as[String].collect().sorted.toSeq == Seq("a", "b"))
    assert(items(idx).as[(String, String)].collect().sorted.toSeq
      == Seq(("a", "1"), ("a", "2"), ("b", "2")))
    assert(values(idx).as[String].collect().sorted.toSeq == Seq("1", "2", "2"))
    assert(uniqueValues(idx).as[String].collect().sorted.toSeq == Seq("1", "2"))
  }

  test("metaQuery sums counts across indexes (query_ddb merge)") {
    import spark.implicits._
    val i1 = build(Seq(("w", "2"), ("x", "1")).toDF("k", "v"), "k", "v")
    val i2 = build(Seq(("w", "3")).toDF("k", "v"), "k", "v")
    val got = metaQuery(Seq(i1, i2), parse("w")).as[(String, Long)].collect()
    assert(got.sameElements(Array(("w", 5L))))
  }
}

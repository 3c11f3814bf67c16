package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DiscoDB query parity (SURVEY.md §2.3 #34-36).
  *
  * DiscoDB is Disco's immutable key→values multimap with a boolean query
  * language over keys: `'this | word'` = OR, `&` = AND, `~` = NOT
  * (reference: doc/howto/discodb.rst:26-71, lib/disco/schemes/
  * scheme_discodb.py:5-29 `Q.urlscan`, examples/util/query_ddb.py).
  *
  * Spark-first shape: the "db" is any (key, value) DataFrame; `build` turns
  * it into an index table `key → sorted values`; a Q expression compiles to
  * a `Column` predicate over a *set of keys attached to a document/row* —
  * matching DiscoDB's semantics where a query selects keys and returns the
  * union of their values.
  *
  * Two query surfaces:
  *  - [[keyPredicate]]: Q over a single key column (point/CNF key selection)
  *  - [[lookup]]/[[metaQuery]]: value retrieval for matching keys, and the
  *    multi-db merge the reference demonstrates (query_ddb.py:14-18).
  */
object QExpr {

  // ----------------------------------------------------------------- parser

  sealed trait Q
  final case class Lit(key: String) extends Q
  final case class And(l: Q, r: Q) extends Q
  final case class Or(l: Q, r: Q) extends Q
  final case class Not(q: Q) extends Q

  /** Recursive-descent parser; precedence `~` > `&` > `|`, parens allowed.
    * Key literals: any run of chars except whitespace and `&|~()`.
    */
  def parse(s: String): Q = {
    val p = new Parser(s)
    val q = p.parseOr()
    p.requireConsumed()
    q
  }

  private final class Parser(s: String) {
    private var i = 0
    private def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s(i) else '\u0000'
    /** The whole input must parse: trailing text ("data model", "a ~b",
      * "a | b) & c") is a malformed query, not a silently-shorter one. */
    def requireConsumed(): Unit = {
      skipWs()
      require(i == s.length,
        s"trailing input at $i in '$s': '${s.substring(i)}'")
    }

    def parseOr(): Q = {
      var l = parseAnd()
      skipWs()
      while (peek == '|') { i += 1; l = Or(l, parseAnd()); skipWs() }
      l
    }
    private def parseAnd(): Q = {
      var l = parseUnary()
      skipWs()
      while (peek == '&') { i += 1; l = And(l, parseUnary()); skipWs() }
      l
    }
    private def parseUnary(): Q = {
      skipWs()
      peek match {
        case '~' => i += 1; Not(parseUnary())
        case '(' =>
          i += 1
          val q = parseOr()
          skipWs()
          require(peek == ')', s"expected ')' at $i in '$s'"); i += 1
          q
        case _ =>
          val start = i
          while (i < s.length && !s(i).isWhitespace && !"&|~()".contains(s(i))) i += 1
          require(i > start, s"expected key literal at $i in '$s'")
          Lit(s.substring(start, i))
      }
    }
  }

  // --------------------------------------------------------------- compiler

  /** Compile a Q to a predicate over a single key column: Lit k → col === k.
    * Useful when each row IS one key (e.g. an inverted-index table).
    */
  def keyPredicate(q: Q, keyCol: Column): Column = q match {
    case Lit(k)   => keyCol === lit(k)
    case And(l, r) => keyPredicate(l, keyCol) && keyPredicate(r, keyCol)
    case Or(l, r)  => keyPredicate(l, keyCol) || keyPredicate(r, keyCol)
    case Not(x)    => !keyPredicate(x, keyCol)
  }

  /** Compile a Q to a predicate over a key-SET column (ArrayType): Lit k →
    * array_contains. This is DiscoDB's document-selection semantics: a doc
    * matches `'a & ~b'` if its key set contains a and not b.
    */
  def setPredicate(q: Q, keysCol: Column): Column = q match {
    case Lit(k)    => array_contains(keysCol, k)
    case And(l, r) => setPredicate(l, keysCol) && setPredicate(r, keysCol)
    case Or(l, r)  => setPredicate(l, keysCol) || setPredicate(r, keysCol)
    case Not(x)    => !setPredicate(x, keysCol)
  }

  // ------------------------------------------------------------------ index

  /** Build the DiscoDB-at-rest analog: key → sorted value list
    * (scheme_discodb.py:31-52 DiscoDBOutput writes a sorted multimap).
    * Written as parquet this is a hash-partitioned, min/max-indexed table —
    * point lookups prune to matching row groups.
    */
  def build(kv: DataFrame, keyCol: String, valCol: String): DataFrame =
    kv.groupBy(col(keyCol).as("key"))
      .agg(array_sort(collect_list(col(valCol).cast("string"))).as("values"))

  /** `query(Q)`: values of keys selected by a Q expression — for
    * OR-of-literals this is the union-of-values the tutorial shows
    * (discodb.rst:33-46). Returns (key, value) exploded rows.
    */
  def lookup(index: DataFrame, q: Q): DataFrame =
    index.filter(keyPredicate(q, col("key")))
      .select(col("key"), explode(col("values")).as("value"))

  /** metaquery over several dbs (query_ddb.py:14-18): run the lookup on each
    * index, merge, and sum integer values per key — exactly the example's
    * client-side `sum(int(v))` merge.
    */
  def metaQuery(indexes: Seq[DataFrame], q: Q): DataFrame =
    indexes.map(lookup(_, q)).reduce(_ unionByName _)
      .groupBy("key")
      .agg(sum(col("value").cast("long")).as("total"))

  // -------------------------------------------------------------- iteration

  /** DiscoDB's iteration surface — `keys()` / `values()` / `items()` /
    * `unique_values()` of the public discodb module (the tutorial's
    * `:mod:discodb` reference, doc/howto/discodb.rst:9; the module itself
    * lives outside this repo). Plain projections over the at-rest index:
    * each is one scan, values streams via explode (never a driver
    * materialization).
    */
  def keys(index: DataFrame): DataFrame = index.select(col("key"))

  def items(index: DataFrame): DataFrame =
    index.select(col("key"), explode(col("values")).as("value"))

  def values(index: DataFrame): DataFrame = items(index).select("value")

  def uniqueValues(index: DataFrame): DataFrame = values(index).distinct()
}

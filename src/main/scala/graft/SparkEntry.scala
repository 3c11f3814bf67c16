package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{RelationalOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 re-expressed
  * Spark-first; [[oracleSql]] carries the DuckDB-equivalent ANSI SQL the
  * driver hash-compares against at sf0.01.
  *
  * Determinism rules used throughout (so Spark parquet == DuckDB result):
  *  - every query ends in a total ORDER BY on its output columns;
  *  - double aggregation goes through DECIMAL(18,2) (exact, order-independent)
  *    and is cast back to DOUBLE for a stable schema;
  *  - column names are aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * orders ⋈ customer (broadcast dim) → per-nation revenue.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("c_nationkey")
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.3 #25 — word count (map + partial/final agg), README.md:17-30 shape.
    "q_wordcount" -> ((s, dir) =>
      TextOps.wordCount(Tables.documents(s, dir), "text")
        .orderBy("word")),

    // §2.3 #26 — distributed grep (map-only regex filter), grep.py:10-21.
    "q_grep" -> ((s, dir) =>
      TextOps.grep(Tables.documents(s, dir), "text", "data[a-z]*")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // §2.6 — partitioned inner equi-join + two-phase count agg,
    // tests/test_query.py:1-120 shape (join on key, count per group).
    "q_join_agg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      RelationalOps.innerJoin(o, c, "o_custkey", "c_custkey", broadcastRight = true)
        .groupBy("c_nationkey")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("c_nationkey")
    }),

    // §2.3 #29 — distributed sort + per-key counts, tests/test_sort.py shape.
    "q_sort_groups" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")),

    // §2.7 — total sort by key (range partition + external sort),
    // util.py:362-388 disk_sort equivalent.
    "q_total_sort" -> ((s, dir) =>
      RelationalOps.totalSort(
        Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_quantity"),
        col("l_orderkey"), col("l_linenumber"))),

    // §2.7 — top-k (TakeOrdered: per-partition heap, no total sort).
    "q_topk" -> ((s, dir) =>
      RelationalOps.topK(
        Tables.orders(s, dir).select("o_orderkey", "o_totalprice"),
        10, col("o_totalprice").desc, col("o_orderkey").asc)),

    // §2.1 #12 — sum_reduce (sum values per key), func.py:175-184.
    "q_sum_reduce" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("l_orderkey")),

    // §2.1 #10 — kvgroup (group equal keys, deterministic value order),
    // util.py:101-110.
    "q_kvgroup" -> ((s, dir) =>
      RelationalOps.kvGroupConcat(Tables.orders(s, dir), "o_custkey", "o_orderkey")
        .orderBy("o_custkey")),

    // §2.5 — distinct (DiscoDB unique keys surface).
    "q_distinct" -> ((s, dir) =>
      Tables.events(s, dir).select("event_type").distinct().orderBy("event_type")),

    // §2.7 — set ops (extension beyond reference: intersect).
    "q_intersect" -> ((s, dir) =>
      Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    // §2.1 #4 — make_range_partition: fixed-width range label, func.py:131-141.
    // min/max stay in-plan via a broadcast 1-row cross join (no collect).
    "q_range_partition" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val bounds = o.agg(
        min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      o.crossJoin(broadcast(bounds))
        .withColumn("label",
          least(greatest(floor((col("o_totalprice") - col("mn")) /
            ((col("mx") - col("mn")) / lit(8))), lit(0)), lit(7)).cast("int"))
        .groupBy("label").agg(count(lit(1)).as("cnt"))
        .orderBy("label")
    }),

    // §2.1 #1/#15 — identity map + echo (tests/test_simple.py shape:
    // map e -> (int(e), str(e))).
    "q_identity_map" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey").as("key"),
          col("o_orderkey").cast("string").as("value"))
        .orderBy("key"))
  )

  // ------------------------------------------------------------- oracle SQL

  def oracleSql: Map[String, String] = Map(
    "q_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY word ORDER BY word""".stripMargin,

    "q_grep" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE regexp_matches(text, 'data[a-z]*')
        |ORDER BY doc_id""".stripMargin,

    "q_join_agg" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_sort_groups" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_total_sort" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_sum_reduce" ->
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q_kvgroup" ->
      """SELECT o_custkey,
        |       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY CAST(o_orderkey AS VARCHAR)) AS vals
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",

    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_range_partition" ->
      """WITH b AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders)
        |SELECT CAST(least(greatest(floor((o_totalprice - mn) / ((mx - mn) / 8)), 0), 7) AS INT) AS label,
        |       count(*) AS cnt
        |FROM orders, b GROUP BY label ORDER BY label""".stripMargin,

    "q_identity_map" ->
      """SELECT o_orderkey AS key, CAST(o_orderkey AS VARCHAR) AS value
        |FROM orders ORDER BY key""".stripMargin
  )
}

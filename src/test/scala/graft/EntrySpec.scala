package graft

import org.apache.spark.sql.functions._

/** Smoke + semantics checks for the SparkEntry query inventory at sf0.001.
  * Exact value parity vs DuckDB is the driver's gate (tools/check.py locally);
  * here we assert shapes and hand-computable invariants.
  */
class EntrySpec extends SparkTestBase {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs, returns rows, and emits a hashable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      // the driver comparator sorts/hashes cell values with pandas —
      // top-level arrays/maps/structs are unhashable there and make the
      // row err even when the math is right (the q_whiten r13 lesson).
      // This defect class must be structurally impossible.
      val complex = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
          || f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]
          || f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
          s"${f.name}: ${f.dataType.simpleString}"
      }
      assert(complex.isEmpty,
        s"$name declares comparator-unhashable top-level column(s): ${complex.mkString(", ")}")
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query with an oracle is declared, and vice-versa names align") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
    // and the reverse: a declared query without an oracle silently
    // downgrades to the driver's weaker rows-only check — every query
    // must carry its DuckDB twin
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }

  test("wordcount total equals token count") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val wc = graft.ops.TextOps.wordCount(docs, "text")
    val totalFromCounts = wc.agg(sum("cnt")).head.getLong(0)
    val tokens = docs
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("w"))
      .filter(col("w") =!= "").count()
    assert(totalFromCounts == tokens)
  }

  test("topk is the global top by totalprice") {
    val o = graft.core.Tables.orders(spark, sfDir)
    val got = SparkEntry.queries("q_topk")(spark, sfDir)
      .select("o_totalprice").collect().map(_.getDouble(0))
    val want = o.select("o_totalprice").collect().map(_.getDouble(0))
      .sorted(Ordering[Double].reverse).take(10)
    assert(got.sameElements(want))
  }

  test("range partition labels cover [0, 8) and sum to table size") {
    val res = SparkEntry.queries("q_range_partition")(spark, sfDir).collect()
    assert(res.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
    val total = res.map(_.getLong(1)).sum
    assert(total == graft.core.Tables.orders(spark, sfDir).count())
  }

  test("repetition profile scores hand-built repetitive and clean docs") {
    import spark.implicits._
    val docs = Seq(
      // "a b" occurs 3x of 5 bigrams; dup bigrams: "a b" (3) + "b a" (2) = 5/5
      (1L, "a b a b a b"),
      // all bigrams distinct
      (2L, "one two three four"),
      // duplicated lines: 3 lines, "x" twice -> 1/3
      (3L, "x\nx\ny"),
      // under n tokens -> zeros
      (4L, "solo")
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.repetitionProfile(docs, "doc_id", "text", 2)
      .orderBy("id")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 0.6, 1.0, 0.0),
      (2L, round6(1.0 / 3), 0.0, 0.0),
      (3L, 0.5, 0.0, round6(1.0 / 3)),
      (4L, 0.0, 0.0, 0.0)))
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("PII redaction masks emails, IPs and phone runs, leaves prose alone") {
    import spark.implicits._
    val got = Seq(
      "mail me at jane.doe+x@sub.example.org today",
      "server 192.168.1.254 is down",
      "call +1 (555) 010-7788 now",
      "five words with no pii",
      "mixed a@b.co and 10.0.0.1 and 555-010-7788"
    ).toDF("t").select(graft.ops.TextOps.redactPii(col("t"))).as[String].collect()
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "server <IP> is down")
    assert(got(2) == "call <PHONE> now")
    assert(got(3) == "five words with no pii")
    assert(got(4) == "mixed <EMAIL> and <IP> and <PHONE>")
  }

  test("tokenChunks covers every token, overlaps by stride, short tail allowed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"),  // 7 tokens, size 3 stride 2 -> starts 1,3,5,7
      (2L, "x y"),            // 2 tokens -> one short chunk
      (3L, "")                // token-less -> no chunks
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.tokenChunks(docs, "doc_id", "text", 3, 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0, 3, "a b c"), (1L, 1, 3, "c d e"), (1L, 2, 3, "e f g"), (1L, 3, 1, "g"),
      (2L, 0, 2, "x y")))
    // every token of doc 1 appears in at least one chunk
    val covered = got.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == Set("a", "b", "c", "d", "e", "f", "g"))
  }

  test("oovProfile scores tokens outside the top-V vocab") {
    import spark.implicits._
    // corpus freq: common x4, mid x2, rare1/rare2 x1 -> vocab(2) = {common, mid}
    val docs = Seq(
      (1L, "common common mid rare1"),
      (2L, "common common mid rare2")
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.oovProfile(docs, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4L, 1L, 0.25), (2L, 4L, 1L, 0.25)))
    // V >= distinct tokens -> zero OOV everywhere
    val all = graft.ops.TextOps.oovProfile(docs, "doc_id", "text", 10)
      .agg(sum("n_oov")).head.getLong(0)
    assert(all == 0L)
  }

  test("weighted sample: k per group, heavy weights dominate, partitioning-invariant") {
    val df = spark.range(0, 1000).select(col("id"),
      lit("g").as("grp"),
      when(col("id") < 500, 1).otherwise(20).as("wt"))
    val pick = graft.ops.Sampling.weightedSamplePerGroup(
        df, col("id"), col("grp"), col("wt"), k = 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pick.size == 100)
    // weight-20 items (ids >= 500) should win the overwhelming majority
    val heavy = pick.count(_ >= 500)
    assert(heavy > 70, s"only $heavy/100 heavy items sampled")
    val again = graft.ops.Sampling.weightedSamplePerGroup(
        df.repartition(13), col("id"), col("grp"), col("wt"), k = 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == pick)
  }

  test("triangle count: K4 has 4, a square has 0, orientation handles hubs") {
    import spark.implicits._
    // K4 on {1,2,3,4}: C(4,3) = 4 triangles
    val k4 = (for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val r1 = graft.ops.GraphOps.triangleCount(k4).collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == (4L, 6L, 4L))
    // 4-cycle: no triangles
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    assert(graft.ops.GraphOps.triangleCount(square).collect().head.getLong(2) == 0L)
    // star + one closing edge: hub 0 with 5 spokes, edge (1,2) -> exactly 1
    val star = ((1 to 5).map(i => (0L, i.toLong)) :+ (1L, 2L)).toDF("a", "b")
    assert(graft.ops.GraphOps.triangleCount(star).collect().head.getLong(2) == 1L)
  }

  test("exact-moments profile agrees with Spark's built-in corr/stddev") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val got = graft.ops.StatsOps.exactMomentsProfile(
        li, "l_returnflag", "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag").collect()
    val want = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), avg("l_quantity").as("m"),
        stddev_samp("l_quantity").as("sd"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .orderBy("l_returnflag").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(1) == w.getLong(1))
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-5, "mean")
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-5, "stddev")
      assert(math.abs(g.getDouble(4) - w.getDouble(4)) < 1e-5, "corr")
    }
  }

  test("resample fills interior gaps with the last observed value") {
    import spark.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 2.0),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 12:00:00"), 3.0),   // same day: sums to 5
      (1L, java.sql.Timestamp.valueOf("2026-01-04 09:00:00"), 7.0),   // 2-day gap
      (2L, java.sql.Timestamp.valueOf("2026-01-02 08:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val got = graft.ops.TimeSeries.resampleDailyFfill(ev, "user_id", "ts", "value")
      .orderBy("user_id", "day")
      .select(col("user_id"), col("day").cast("string"), col("gap"), col("filled_value"))
      .as[(Long, String, Boolean, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "2026-01-01", false, 5.0),
      (1L, "2026-01-02", true, 5.0),
      (1L, "2026-01-03", true, 5.0),
      (1L, "2026-01-04", false, 7.0),
      (2L, "2026-01-02", false, 1.0)))
  }

  test("pivot fills absent cells with 0 and unpivot restores the long form") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "b"))
      .toDF("k", "t")
    val wide = graft.ops.RelationalOps.pivotCounts(df, "k", "t", Seq("a", "b", "c"))
      .orderBy("k").as[(Long, Long, Long, Long)].collect().toSeq
    assert(wide == Seq((1L, 2L, 1L, 0L), (2L, 0L, 1L, 0L)))
    val long = graft.ops.RelationalOps.unpivot(
        graft.ops.RelationalOps.pivotCounts(df, "k", "t", Seq("a", "b", "c")),
        "k", Seq("a", "b", "c"))
      .orderBy("k", "name").as[(Long, String, Long)].collect().toSeq
    assert(long == Seq((1L, "a", 2L), (1L, "b", 1L), (1L, "c", 0L),
      (2L, "a", 0L), (2L, "b", 1L), (2L, "c", 0L)))
  }

  test("applyChangelog: latest wins, deletes drop keys, untouched keys survive") {
    import spark.implicits._
    val snap = Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"))
      .toDF("k", "version", "payload")
    val changes = Seq(
      (1L, 2L, "a2", "upsert"),   // update
      (2L, 2L, "b2", "delete"),   // delete
      (4L, 2L, "d", "upsert"),    // insert
      (3L, 0L, "c0", "upsert")    // STALE change: older than snapshot -> loses
    ).toDF("k", "version", "payload", "op")
    val got = graft.ops.ChangeOps.applyChangelog(snap, changes, "k", "version", "op")
      .orderBy("k").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, "a2"), (3L, 1L, "c"), (4L, 2L, "d")))
  }

  test("tableProfile counts rows, nulls, and exact distincts per column in one melt") {
    import spark.implicits._
    val df = Seq((Option(1L), Option("a")), (Option(1L), Option.empty[String]),
      (Option.empty[Long], Option("b"))).toDF("x", "y")
    val p = graft.ops.StatsOps.tableProfile(df, Seq("x", "y"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(p(("x")) == (("x", 3L, 1L, 1L)), s"got ${p("x")}") // distinct non-nulls {1}
    assert(p(("y")) == (("y", 3L, 1L, 2L)), s"got ${p("y")}")
  }

  test("snapshotDiff labels added/removed/changed/unchanged with column lists") {
    import spark.implicits._
    val oldS = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "s", "n")
    val newS = Seq((1L, "a", 10L),          // unchanged
      (2L, "B", 21L),                       // both value cols changed
      (4L, "d", 41L),                       // one col changed
      (5L, "e", 50L))                       // added; 3 removed
      .toDF("k", "s", "n")
    val got = graft.ops.ChangeOps.snapshotDiff(oldS, newS, Seq("k"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, "unchanged", ""), (2L, "changed", "s,n"), (3L, "removed", ""),
      (4L, "changed", "n"), (5L, "added", "")), s"got $got")
    // null-safe equality: null == null is NOT a change, null vs value is
    val o2 = Seq((1L, Option.empty[String]), (2L, Option("x"))).toDF("k", "s")
    val n2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val g2 = graft.ops.ChangeOps.snapshotDiff(o2, n2, Seq("k"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(g2 == Seq((1L, "unchanged", ""), (2L, "changed", "s")), s"got $g2")
  }

  test("maintainAgg equals full recompute: moves, deletes, inserts, stale, emptied group") {
    import spark.implicits._
    val snap = Seq(
      (1L, 0L, "a", 10.0), (2L, 0L, "a", 20.0), (3L, 0L, "b", 30.0),
      (4L, 0L, "c", 40.0)).toDF("k", "v", "g", "x")
    val changes = Seq(
      (1L, 2L, "b", 11.0, "upsert"),  // group move a -> b, value change
      (2L, 2L, "a", 25.0, "upsert"),  // in-place update
      (3L, 2L, "b", 0.0, "delete"),   // delete
      (4L, 2L, "c", 0.0, "delete"),   // empties group c entirely
      (5L, 2L, "d", 50.0, "upsert"),  // brand-new key and group
      (9L, 2L, "z", 9.0, "delete"),   // delete of a key that never existed
      (2L, 1L, "a", 999.0, "upsert")  // stale vs v2 above (same key, older)
    ).toDF("k", "v", "g", "x", "op")
    val base = graft.ops.ChangeOps.groupAgg(snap, "g", "x")
    val got = graft.ops.ChangeOps
      .maintainAgg(base, snap, changes, "k", "v", "op", "g", "x")
      .select(col("g"), col("cnt"), col("sum_val").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    val recomputed = graft.ops.ChangeOps.groupAgg(
        graft.ops.ChangeOps.applyChangelog(snap, changes, "k", "v", "op"),
        "g", "x")
      .select(col("g"), col("cnt"), col("sum_val").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == recomputed, s"ivm $got != recompute $recomputed")
    // expected state: a={2:25}, b={1:11}, d={5:50}; c emptied and absent
    assert(got == Set(("a", 1L, 25.0), ("b", 1L, 11.0), ("d", 1L, 50.0)))
    // chaining: maintaining the maintained agg with an empty changelog is a no-op
    val empty = changes.limit(0)
    val again = graft.ops.ChangeOps.maintainAgg(
        graft.ops.ChangeOps.maintainAgg(base, snap, changes, "k", "v", "op", "g", "x"),
        graft.ops.ChangeOps.applyChangelog(snap, changes, "k", "v", "op")
          .select("k", "v", "g", "x"),
        empty, "k", "v", "op", "g", "x")
      .select(col("g"), col("cnt"), col("sum_val").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(again == got)
  }

  test("maintainAgg min/max: extremum deletes heal via bounded group rescan") {
    import spark.implicits._
    val snap = Seq(
      (1L, 0L, "a", 10.0), (2L, 0L, "a", 50.0), (3L, 0L, "a", 30.0),
      (4L, 0L, "b", 5.0), (5L, 0L, "b", 5.0), (6L, 0L, "b", 7.0),
      (7L, 0L, "c", 100.0), (8L, 0L, "c", 1.0)).toDF("k", "v", "g", "x")
    val changes = Seq(
      (2L, 2L, "a", 0.0, "delete"),   // deletes a's MAX (50) -> repair: max 30
      (4L, 2L, "b", 0.0, "delete"),   // deletes ONE of b's tied mins -> min stays 5
      (7L, 2L, "d", 100.0, "upsert"), // c's max MOVES to new group d -> c repairs
      (9L, 2L, "a", 2.0, "upsert")    // new min for a WITHOUT repair (add covers)
    ).toDF("k", "v", "g", "x", "op")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("g"), col("cnt"), col("sum_val").cast("double"),
        col("min_val").cast("double"), col("max_val").cast("double"))
      .as[(String, Long, Double, Double, Double)].collect().toSet
    val base = graft.ops.ChangeOps.groupAgg(snap, "g", "x")
    val got = shape(graft.ops.ChangeOps
      .maintainAgg(base, snap, changes, "k", "v", "op", "g", "x"))
    val recomputed = shape(graft.ops.ChangeOps.groupAgg(
      graft.ops.ChangeOps.applyChangelog(snap, changes, "k", "v", "op"), "g", "x"))
    assert(got == recomputed, s"ivm $got != recompute $recomputed")
    assert(got == Set(
      ("a", 3L, 42.0, 2.0, 30.0),  // max healed by rescan, min from the add
      ("b", 2L, 12.0, 5.0, 7.0),   // tied-min survivor keeps 5
      ("c", 1L, 1.0, 1.0, 1.0),    // mover's source group healed by rescan
      ("d", 1L, 100.0, 100.0, 100.0)))
    // second batch chains off the maintained agg: delete the healed max again
    val applied = graft.ops.ChangeOps.applyChangelog(snap, changes, "k", "v", "op")
      .select("k", "v", "g", "x")
    val ch2 = Seq((3L, 4L, "a", 0.0, "delete")).toDF("k", "v", "g", "x", "op")
    val got2 = shape(graft.ops.ChangeOps.maintainAgg(
      graft.ops.ChangeOps.maintainAgg(base, snap, changes, "k", "v", "op", "g", "x"),
      applied, ch2, "k", "v", "op", "g", "x"))
    val rec2 = shape(graft.ops.ChangeOps.groupAgg(
      graft.ops.ChangeOps.applyChangelog(applied, ch2, "k", "v", "op"), "g", "x"))
    assert(got2 == rec2)
    assert(got2.contains(("a", 2L, 12.0, 2.0, 10.0)))
  }

  test("scd2: intervals chain per key, exactly one current row") {
    import spark.implicits._
    val changes = Seq((1L, 10L, "x"), (1L, 20L, "y"), (1L, 30L, "z"), (2L, 5L, "w"))
      .toDF("k", "v", "state")
    val got = graft.ops.ChangeOps.scd2(changes, "k", "v")
      .select("k", "valid_from", "valid_to", "state", "is_current")
      .orderBy("k", "valid_from")
      .as[(Long, Long, Option[Long], String, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, Some(20L), "x", false),
      (1L, 20L, Some(30L), "y", false),
      (1L, 30L, None, "z", true),
      (2L, 5L, None, "w", true)))
  }

  test("contamination flags exactly the docs sharing trigrams with the benchmark") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),    // trigrams: abg, bgd
      (2L, "alpha beta gamma"),          // abg only -> fully contaminated
      (3L, "one two three four"),        // disjoint
      (4L, "short doc")                  // < 3 tokens -> excluded
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("alpha beta gamma zeta")).toDF("text")
    val got = graft.ops.TextOps.contamination(docs, "doc_id", "text", bench, "text")
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 0.5), (2L, 1L, 1.0), (3L, 0L, 0.0)))
  }
}

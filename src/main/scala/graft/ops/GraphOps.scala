package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-shot graph analytics over edge-list DataFrames (the iterative
  * algorithms — PageRank, connected components — live in [[graft.chain]]
  * and [[graft.dedup.Dedup.connectedComponents]]).
  */
object GraphOps {

  /** Co-occurrence edges: distinct unordered pairs of `itemCol` values
    * sharing a `groupCol` value (parts co-ordered in one order, terms
    * co-occurring in one doc). The self-join is keyed on the group — cost
    * is Σ(group size)², bounded by the natural group size, never corpus².
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String,
                        itemCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    g.as("x").join(g.as("y"),
        col("x.g") === col("y.g") && col("x.i") < col("y.i"))
      .select(col("x.i").as("a"), col("y.i").as("b"))
      .distinct()
  }

  /** Synchronous label propagation (Raghavan, Albert & Kumara 2007,
    * "Near linear time algorithm to detect community structures") made
    * fully deterministic: every node starts labeled with its own id; each
    * round every node simultaneously adopts the label held by the MOST of
    * its neighbors, ties broken by the SMALLEST label. The asynchronous
    * variant's update-order nondeterminism is exactly what an
    * oracle-checked distributed op cannot tolerate, and synchronous LPA
    * can oscillate on bipartite structure — so the round count is FIXED
    * (not run-to-convergence), which also makes the result replayable in
    * any ANSI engine as `iterations` unrolled join+argmax layers
    * ([[lpaSql]]).
    *
    * Shape at 100 TB: per round, one hash equi-join (undirected edges ⋈
    * labels on the neighbor endpoint) and two hash aggregations keyed
    * (node, label) then node — all map-side combinable, no corpus-global
    * key, no window over a whole partition. Rounds are driver-sequenced
    * with localCheckpoint to cut lineage, like
    * [[graft.dedup.Dedup.connectedComponents]]. Wedge/hub cost is linear
    * in edge count per round (each edge contributes one vote).
    *
    * Input: undirected distinct edges (a, b), a ≠ b. Output: (id, lbl)
    * for every node appearing in an edge.
    */
  def labelPropagation(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "labelPropagation needs at least one round")
    val und = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var labels = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")).localCheckpoint()
    for (_ <- 1 to iterations) {
      // argmax(count desc, label asc) as one aggregation: max of
      // (count, -label) orders first by vote count, then by SMALLEST
      // label — no per-node window, no row_number over a shuffle.
      labels = graft.core.Lineage.truncate(
        und.join(labels.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
          .groupBy(col("src"))
          .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
          .select(col("src").as("id"), (-col("m.nl")).as("lbl")))
    }
    labels
  }

  /** k-core: the maximal subgraph in which every node keeps degree ≥ k
    * (Seidman 1983) — the standard "strip the periphery, keep the
    * load-bearing community" graph cleanup. Computed by the peeling
    * fixpoint: repeatedly drop nodes whose degree among SURVIVORS falls
    * below k. Runs to convergence (driver-sequenced rounds, like
    * [[graft.dedup.Dedup.connectedComponents]]) and REFUSES an
    * unconverged result; because peeling is IDEMPOTENT at the fixpoint,
    * an oracle that unrolls `maxRounds` layers ([[kCoreSql]]) lands on
    * the same answer regardless of how many rounds convergence actually
    * took.
    *
    * Shape at 100 TB: per round two hash equi-joins (edges ⋈ survivors
    * on each endpoint) + one map-side-combinable degree count — linear
    * in surviving edges, no corpus-global key.
    *
    * Output: (v, deg) for each k-core member, deg = its degree INSIDE
    * the core.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 20): DataFrame = {
    require(k >= 1, s"kCore needs k >= 1: $k")
    val und = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    def peel(alive: DataFrame): DataFrame = und
      .join(alive.withColumnRenamed("v", "src"), "src")
      .join(alive.withColumnRenamed("v", "dst"), "dst")
      .groupBy("src").agg(count(lit(1)).as("d"))
      .filter(col("d") >= k)
    var alive = und.select(col("src").as("v")).distinct().localCheckpoint()
    var n = alive.count()
    var changed = true
    var i = 0
    while (changed && i < maxRounds) {
      // truncate, not bare localCheckpoint: peel references `alive` twice
      // (src + dst joins) → carried size estimate doubles digits per round
      // (see graftbridge.localCheckpointCappedStats).
      val next = graft.core.Lineage.truncate(
        peel(alive).select(col("src").as("v")))
      val m = next.count()
      changed = m != n
      alive = next; n = m
      i += 1
    }
    require(!changed,
      s"kCore did not converge in $maxRounds peeling rounds")
    peel(alive).select(col("src").as("v"), col("d").as("deg"))
  }

  /** The SQL an ANSI engine needs to replay [[kCore]] — `maxRounds`
    * peeling layers unrolled (idempotence at the fixpoint makes the
    * fixed unroll exact; MATERIALIZED pins each layer to one
    * evaluation). `edgeCte` must define columns (a, b).
    */
  def kCoreSql(edgeCte: String, k: Int, maxRounds: Int = 20): String = {
    val layers = (1 to maxRounds).map { i =>
      s"""a$i AS MATERIALIZED (
         |  SELECT src AS v FROM (
         |    SELECT u.src, count(*) AS c
         |    FROM und u JOIN a${i - 1} x ON u.src = x.v
         |               JOIN a${i - 1} y ON u.dst = y.v
         |    GROUP BY u.src)
         |  WHERE c >= $k)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS ($edgeCte),
       |und AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
       |        UNION ALL SELECT b AS src, a AS dst FROM e),
       |a0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM und),
       |$layers
       |SELECT u.src AS v, CAST(count(*) AS BIGINT) AS deg
       |FROM und u JOIN a$maxRounds x ON u.src = x.v
       |           JOIN a$maxRounds y ON u.dst = y.v
       |GROUP BY u.src HAVING count(*) >= $k""".stripMargin
  }

  /** The SQL an ANSI engine needs to replay [[labelPropagation]] — the
    * fixed rounds unrolled as chained CTE layers (kept adjacent so the
    * two formulas can't drift). `edgeCte` must define columns (a, b).
    */
  def lpaSql(edgeCte: String, iterations: Int): String = {
    val layers = (1 to iterations).map { k =>
      s"""l$k AS (
         |  SELECT src AS id, lbl FROM (
         |    SELECT src, lbl, c,
         |           row_number() OVER (PARTITION BY src ORDER BY c DESC, lbl ASC) AS rn
         |    FROM (SELECT u.src, l.lbl, count(*) AS c
         |          FROM und u JOIN l${k - 1} l ON u.dst = l.id
         |          GROUP BY u.src, l.lbl))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS ($edgeCte),
       |und AS (SELECT a AS src, b AS dst FROM e
       |        UNION ALL SELECT b AS src, a AS dst FROM e),
       |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM und),
       |$layers
       |SELECT id, lbl FROM l$iterations""".stripMargin
  }

  /** Triangle count by degree-ordered edge orientation (the standard
    * distributed plan: Suri & Vassilvitskii 2011 "Counting triangles and
    * the curse of the last reducer"). Each undirected edge is oriented
    * from its lower-(degree, id) endpoint to the higher one; wedges are
    * generated only at each edge's LOW-degree endpoint, so wedge volume is
    * O(m^1.5) instead of Σdeg² — a hub with a million neighbors generates
    * no wedges at all. Closing edges are found with one equi-join back to
    * the oriented edge set. The count is orientation-invariant: the
    * id-ordered brute force (the DuckDB oracle) gives the same number.
    *
    * Input: undirected distinct edges (a, b), a ≠ b.
    * Output: one row (n_nodes, n_edges, n_triangles).
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    // cache contract (same as graft.dedup.Dedup): the edge list feeds the
    // degree table, the orientation join and the final census; the oriented
    // set feeds BOTH wedge sides and the closing probe — uncached, the
    // upstream edge build (often a group self-join) would run 3x
    val e = edges.cache()
    val deg = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient u -> w iff (d, id) of u < (d, id) of w
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val oriented = withDeg.select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"), col("da").as("dw"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"), col("e.dw").as("dw"))
      .cache()
    // wedges at the low endpoint, the pair ordered by the SAME (degree, id)
    // total order as the orientation — the closing oriented edge can only
    // run from the (d, id)-smaller target to the larger one
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.dw") < col("e2.dw") ||
            (col("e1.dw") === col("e2.dw") && col("e1.w") < col("e2.w"))))
      .select(col("e1.w").as("u"), col("e2.w").as("w"))
    val triangles = wedges.join(oriented.select("u", "w"), Seq("u", "w"), "left_semi")
    e.agg(count(lit(1)).as("n_edges")).crossJoin(
        deg.agg(count(lit(1)).as("n_nodes"))).crossJoin(
        triangles.agg(count(lit(1)).as("n_triangles")))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}

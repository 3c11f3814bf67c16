package graft

import org.apache.spark.sql.functions._

import graft.ops.StatsOps

/** Hand-computed fixtures for the power-iteration top principal
  * component: axis-aligned and rotated rank-1 clouds with known
  * eigenpairs, plus the unit-norm and eigen-equation invariants.
  */
class PcaSpec extends SparkTestBase {

  test("topPrincipalComponent: axis-aligned cloud recovers e1 and the variance") {
    import spark.implicits._
    // zero-mean points on dim 1 only: variance = (4+4+1+1)/4 = 2.5,
    // top PC = e1, eigval = 2.5 — converges at the first iteration
    // (rank-1: every later round is a fixed point)
    val df = Seq(Seq(2.0, 0.0, 0.0), Seq(-2.0, 0.0, 0.0),
      Seq(1.0, 0.0, 0.0), Seq(-1.0, 0.0, 0.0)).toDF("embedding")
    val got = StatsOps.topPrincipalComponent(df, "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) == ((1.0, 2.5)))
    assert(got(2L)._1 == 0.0 && got(3L)._1 == 0.0)
  }

  test("topPrincipalComponent: rank-1 rotated cloud recovers the direction") {
    import spark.implicits._
    // points t·(0.6, 0.8), t ∈ {−2,−1,1,2}: C = 2.5·uuᵀ with u=(0.6,0.8) —
    // one multiply by C lands exactly on u (rank 1), eigval 2.5
    val df = Seq(-2.0, -1.0, 1.0, 2.0)
      .map(t => Seq(0.6 * t, 0.8 * t)).toDF("embedding")
    val got = StatsOps.topPrincipalComponent(df, "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) == ((0.6, 2.5)))
    assert(got(2L) == ((0.8, 2.5)))
  }

  test("topTwoPrincipalComponents: diagonal cloud recovers both eigenpairs") {
    import spark.implicits._
    // cov = diag(10/6, 2/6): v1 = e1 (λ 1.666667), deflation leaves
    // diag(~0, 1/3) → v2 = e2 (λ 0.333333) — both exact from the
    // all-ones start
    val df = Seq(Seq(2.0, 0.0), Seq(-2.0, 0.0), Seq(1.0, 0.0),
      Seq(-1.0, 0.0), Seq(0.0, 1.0), Seq(0.0, -1.0)).toDF("embedding")
    val got = StatsOps.topTwoPrincipalComponents(df, "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got((1, 1L)) == ((1.0, 1.666667)))
    assert(got((1, 2L))._1 == 0.0)
    assert(got((2, 2L)) == ((1.0, 0.333333)))
    assert(math.abs(got((2, 1L))._1) < 1e-6)
  }

  test("topTwoPrincipalComponents on real embeddings: unit norms, near-orthogonal, ordered") {
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val rows = StatsOps.topTwoPrincipalComponents(e, "embedding").collect()
    val v1 = rows.filter(_.getInt(0) == 1).sortBy(_.getLong(1)).map(_.getDouble(2))
    val v2 = rows.filter(_.getInt(0) == 2).sortBy(_.getLong(1)).map(_.getDouble(2))
    val l1 = rows.find(_.getInt(0) == 1).get.getDouble(3)
    val l2 = rows.find(_.getInt(0) == 2).get.getDouble(3)
    assert(math.abs(v1.map(x => x * x).sum - 1.0) < 1e-5)
    assert(math.abs(v2.map(x => x * x).sum - 1.0) < 1e-5)
    assert(l2 > 0.0 && l2 <= l1 * 1.01, s"eigvals out of order: $l1, $l2")
    // deflation used the 16-round (not fully converged) v1, so v2 keeps
    // an O(residual) v1 component — near-orthogonal, not exactly
    val dot = math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum)
    assert(dot < 0.15, s"v1·v2 = $dot")
  }

  test("whitenAllButTop: a rank-1 cloud whitens to zero; real rows lose the v-direction") {
    import spark.implicits._
    // every point sits ON the top PC → centering + removing the v
    // projection leaves nothing
    val rank1 = Seq(-2.0, -1.0, 1.0, 2.0)
      .map(t => (t.toLong, Seq(0.6 * t, 0.8 * t))).toDF("vec_id", "embedding")
    val z = StatsOps.whitenAllButTop(rank1, "vec_id", "embedding")
      .collect().flatMap(_.getSeq[Double](1))
    assert(z.forall(x => math.abs(x) < 1e-9), s"rank-1 residual: ${z.toSeq}")

    // real embeddings: each whitened row must be orthogonal to the fitted
    // top PC (that projection was subtracted exactly), up to round-6 noise
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val v = StatsOps.topPrincipalComponent(e, "embedding")
      .collect().sortBy(_.getLong(0)).map(_.getDouble(1))
    val w = StatsOps.whitenAllButTop(e, "vec_id", "embedding")
      .collect().map(_.getSeq[Double](1))
    val maxDot = w.map(row =>
      math.abs(row.zip(v).map { case (a, b) => a * b }.sum)).max
    assert(maxDot < 1e-4, s"residual projection onto v: $maxDot")
  }

  test("topPrincipalComponent invariants on real embeddings: unit norm, C·v = λ·v") {
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val rows = StatsOps.topPrincipalComponent(e, "embedding").collect()
    assert(rows.length == 64)
    val v = rows.sortBy(_.getLong(0)).map(_.getDouble(1))
    val lam = rows.head.getDouble(2)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-5, "loading not unit-norm")
    assert(lam > 0.0)
    // eigen-equation residual: rebuild C from the same data and check
    // ‖C·v − λ·v‖ is small relative to λ. The synthetic spectrum is
    // near-flat (λ₂/λ₁ ≈ 0.93 measured), so 16 fixed rounds converge to
    // ~3% — the op's determinism never depended on convergence
    val vecs = e.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length.toDouble
    val d = v.length
    val mu = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    def cov(i: Int, j: Int) =
      vecs.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / n
    val cv = Array.tabulate(d)(i =>
      (0 until d).map(j => cov(i, j) * v(j)).sum)
    val resid = math.sqrt((0 until d).map(i =>
      (cv(i) - lam * v(i)) * (cv(i) - lam * v(i))).sum)
    assert(resid / lam < 0.05, s"eigen residual $resid vs lambda $lam")
  }

  test("degenerate input (all vectors identical) yields zero loadings, never NaN") {
    import spark.implicits._
    // zero covariance -> the power rounds' norm is 0; the guard keeps the
    // zero iterate instead of dividing into NaN (and the SQL twin's CASE
    // does the same)
    val e = Seq.fill(5)(Seq(1.0, 2.0, 3.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val rows = StatsOps.topPrincipalComponent(e, "embedding").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(!r.getDouble(1).isNaN && r.getDouble(1) == 0.0, s"loading: $r")
      assert(!r.getDouble(2).isNaN && r.getDouble(2) == 0.0, s"eigval: $r")
    }
    val w = StatsOps.whitenAllButTop(e, "vec_id", "embedding")
      .collect().map(_.getSeq[Double](1))
    // whitening degrades to plain mean-centering: all-zero residuals here
    assert(w.forall(_.forall(x => !x.isNaN && x == 0.0)))
  }
}

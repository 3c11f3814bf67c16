package graft

import org.apache.spark.sql.functions._

import graft.ops.{EvalMetrics, OverlapEval}

/** Hand-computed fixtures for the generation-eval ops: BLEU clipping/BP,
  * ROUGE-N, the slice-pair construction, self-consistency majority vote,
  * and Cohen's kappa.
  */
class GenEvalSpec extends SparkTestBase {

  test("ngramOverlap: the Papineni clipping example") {
    import spark.implicits._
    // cand = 'the'×7 vs ref = 'the cat is on the mat': clipped unigram
    // matches = min(7, 2) = 2 of 7 candidate tokens
    val pair = Seq((1, Seq.fill(7)("the"),
      Seq("the", "cat", "is", "on", "the", "mat")))
      .toDF("id", "cand", "ref")
    val r = OverlapEval.ngramOverlap(pair, maxN = 1).collect()
    assert(r.length == 1)
    assert((r(0).getInt(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3)) == ((1, 2L, 7L, 6L)))
  }

  test("bleu: identical pair scores 1, disjoint pair scores 0") {
    import spark.implicits._
    val same = Seq((1, Seq("a", "b", "c", "d", "e"),
      Seq("a", "b", "c", "d", "e"))).toDF("id", "cand", "ref")
    val s = OverlapEval.bleu(same, maxN = 4).collect()(0)
    assert(s.getDouble(0) == 1.0 && s.getDouble(5) == 1.0) // bp, bleu
    val disj = Seq((1, Seq("x", "y", "z", "w", "v"),
      Seq("a", "b", "c", "d", "e"))).toDF("id", "cand", "ref")
    val d = OverlapEval.bleu(disj, maxN = 4).collect()(0)
    assert(d.getDouble(5) == 0.0 && d.getDouble(1) == 0.0) // bleu, p1
  }

  test("bleu: brevity penalty exp(1 - r/c) when the candidate is short") {
    import spark.implicits._
    // cand = prefix half of ref: every n-gram matches (p_n = 1),
    // bp = exp(1 - 8/4) = e^-1
    val pair = Seq((1, Seq("a", "b", "c", "d"),
      Seq("a", "b", "c", "d", "e", "f", "g", "h")))
      .toDF("id", "cand", "ref")
    val r = OverlapEval.bleu(pair, maxN = 4).collect()(0)
    assert(r.getDouble(0) == 0.367879) // bp = round(e^-1, 6)
    assert((1 to 4).forall(k => r.getDouble(k) == 1.0))
    assert(r.getDouble(5) == 0.367879) // bleu = bp · 1
  }

  test("rougeN: clipped precision/recall/F1 hand values") {
    import spark.implicits._
    // cand = [a,b,b], ref = [a,b,c]: clipped = min(1,1)+min(2,1) = 2,
    // p = r = f1 = 2/3
    val pair = Seq((1, Seq("a", "b", "b"), Seq("a", "b", "c")))
      .toDF("id", "cand", "ref")
    val r = OverlapEval.rougeN(pair, maxN = 1).collect()(0)
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
      ((0.666667, 0.666667, 0.666667)))
  }

  test("slicePair: 60/70 split of a 10-token doc overlaps in the middle") {
    import spark.implicits._
    val df = Seq((1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val r = OverlapEval.slicePair(df, "doc_id", "text").collect()(0)
    assert(r.getSeq[String](1) == (0 until 6).map(i => s"t$i")) // first 60%
    assert(r.getSeq[String](2) == (3 until 10).map(i => s"t$i")) // last 70%
  }

  test("distinctN: pooled distinct/total ratios per group and order") {
    import spark.implicits._
    // g1 pools 'a a b' + 'a b': unigrams 5 total / 2 distinct = 0.4,
    // bigrams [a a, a b, a b] = 3 total / 2 distinct = 0.666667
    // g2 'x y' is all-distinct at both orders
    val df = Seq(("g1", "a a b"), ("g1", "a b"), ("g2", "x y"))
      .toDF("grp", "text")
    val got = EvalMetrics.distinctN(df, "grp", "text", maxN = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(("g1", 1)) == ((5L, 2L, 0.4)))
    assert(got(("g1", 2)) == ((3L, 2L, 0.666667)))
    assert(got(("g2", 1)) == ((2L, 2L, 1.0)))
    assert(got(("g2", 2)) == ((1L, 1L, 1.0)))
  }

  test("majorityVote: modal answer, min tie-break, gold flag") {
    import spark.implicits._
    val df = (Seq.fill(3)(("p1", "yes")) ++ Seq.fill(2)(("p1", "no")) ++
      Seq(("p2", "b"), ("p2", "a")) ++ // tie → min wins
      Seq.fill(2)(("p3", "yes"))).toDF("prob", "ans")
    val got = EvalMetrics.majorityVote(df, "prob", "ans", gold = "yes")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getInt(5))).toMap
    assert(got("p1") == (("yes", 3L, 5L, 0.6, 1)))
    assert(got("p2") == (("a", 1L, 2L, 0.5, 0)))
    assert(got("p3") == (("yes", 2L, 2L, 1.0, 1)))
  }

  test("cohenKappa: textbook 2x2 confusion gives kappa 0.4") {
    import spark.implicits._
    // cells (A,A)=20 (A,B)=5 (B,A)=10 (B,B)=15: po = 35/50 = 0.7,
    // pe = (25·30 + 25·20)/50² = 0.5, kappa = 0.2/0.5 = 0.4
    val df = (Seq.fill(20)(("A", "A")) ++ Seq.fill(5)(("A", "B")) ++
      Seq.fill(10)(("B", "A")) ++ Seq.fill(15)(("B", "B"))).toDF("a", "b")
    val r = EvalMetrics.cohenKappa(df, "a", "b").collect()(0)
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
      ((50L, 0.7, 0.5, 0.4)))
  }

  test("ngramOverlap property: swapping cand/ref swaps precision and recall") {
    import spark.implicits._
    // min() is symmetric and the totals swap roles, so ROUGE over the
    // swapped pair must mirror p <-> r exactly — for every n
    val rnd = new scala.util.Random(42)
    def arr() = Seq.fill(5 + rnd.nextInt(20))("w" + rnd.nextInt(8))
    val pairs = (1 to 20).map(i => (i, arr(), arr()))
    val fwd = OverlapEval.rougeN(pairs.toDF("id", "cand", "ref"), maxN = 2)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rev = OverlapEval.rougeN(pairs.map(p => (p._1, p._3, p._2))
        .toDF("id", "cand", "ref"), maxN = 2)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for (n <- 1 to 2) {
      assert(fwd(n)._1 == rev(n)._2 && fwd(n)._2 == rev(n)._1,
        s"n=$n: ${fwd(n)} vs swapped ${rev(n)}")
    }
  }

  test("chrF: hand values — F equals P when P = R, recall weighted 2x") {
    import spark.implicits._
    // cand='abc' ref='abd', maxN=2: p1=r1=2/3, p2=r2=1/2 →
    // chrp=chrr=7/12, chrf = 7/12 (F = P when P = R)
    val pr = Seq((1, "abc", "abd")).toDF("id", "cand", "ref")
    val r1 = OverlapEval.chrF(pr, maxN = 2).collect()(0)
    assert((r1.getDouble(0), r1.getDouble(1), r1.getDouble(2)) ==
      ((0.583333, 0.583333, 0.583333)))
    // cand='aa' ref='aaa', maxN=1: p=1, r=2/3 → F2 = 5·(2/3)/(4+2/3) = 5/7
    val pr2 = Seq((1, "aa", "aaa")).toDF("id", "cand", "ref")
    val r2 = OverlapEval.chrF(pr2, maxN = 1).collect()(0)
    assert((r2.getDouble(0), r2.getDouble(1), r2.getDouble(2)) ==
      ((1.0, 0.666667, 0.714286)))
  }

  test("wilsonWinRate: hand intervals incl. the 0-win and all-win clamps") {
    import spark.implicits._
    // A beats B 8×, B beats A 2×; C beats D 5×. Wilson(z=1.96):
    // 8/10 → (0.490157, 0.943319); 2/10 mirrors; 5/5 → (0.565509, 1.0);
    // 0/5 → (0.0, 0.434491)
    val games = (Seq.fill(8)(("A", "B")) ++ Seq.fill(2)(("B", "A")) ++
      Seq.fill(5)(("C", "D"))).toDF("win", "lose")
    val got = graft.ops.EvalMetrics.wilsonWinRate(games, "win", "lose")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got("A") == ((8L, 10L, 0.8, 0.490157, 0.943319)))
    assert(got("B") == ((2L, 10L, 0.2, 0.056681, 0.509843)))
    assert(got("C") == ((5L, 5L, 1.0, 0.565509, 1.0)))
    assert(got("D") == ((0L, 5L, 0.0, 0.0, 0.434491)))
  }

  test("cohenKappa: perfect single-cell agreement yields null (pe = 1)") {
    import spark.implicits._
    val df = Seq.fill(4)(("A", "A")).toDF("a", "b")
    val r = EvalMetrics.cohenKappa(df, "a", "b").collect()(0)
    assert(r.isNullAt(3))
  }

  test("cohenKappa: disjoint rater label sets give pe = 0 and kappa = po, not NULL") {
    import spark.implicits._
    // rater a only uses {A, B}, rater b only {X, Y}: no shared label, so
    // the chance-agreement marginal product is empty — pe is genuinely 0
    val df = Seq(("A", "X"), ("A", "Y"), ("B", "X"), ("B", "Y"))
      .toDF("a", "b")
    val r = EvalMetrics.cohenKappa(df, "a", "b")
      .collect()(0)
    assert(r.getDouble(2) == 0.0, s"pe: ${r.get(2)}")
    assert(!r.isNullAt(3) && r.getDouble(3) == r.getDouble(1),
      s"kappa must equal po: $r")
  }

  // ---- editEval (CER / WER) -------------------------------------------------

  test("editEval: hand-computed CER and WER, micro-averaged") {
    import spark.implicits._
    // pair 1: cand 'a b c' vs ref 'a x c' — 1 word substitution of 3 ref
    // words; char strings differ by 1 edit of 5 ref chars.
    // pair 2: identical — 0 edits, 3 ref words, 5 ref chars.
    val pairs = Seq(
      (1, Seq("a", "b", "c"), Seq("a", "x", "c")),
      (2, Seq("a", "b", "c"), Seq("a", "b", "c")))
      .toDF("id", "cand", "ref")
    val r = OverlapEval.editEval(pairs).collect()(0)
    assert(r.getLong(0) == 2L)                       // pairs
    assert(r.getLong(1) == 1L && r.getLong(2) == 10L) // char edits / chars
    assert(r.getDouble(3) == 0.1)                     // cer
    assert(r.getLong(4) == 1L && r.getLong(5) == 6L)  // word edits / words
    assert(r.getDouble(6) == 0.166667)                // wer (round 6)
  }

  test("editEval: WER counts insertions/deletions; window caps the tokens") {
    import spark.implicits._
    // cand drops one token and appends one: levenshtein = 2 over 3 ref
    // words (multi-char tokens map to single symbols, so WER is truly
    // token-level, not char-level)
    val p = Seq((1, Seq("alpha", "gamma", "zeta"),
      Seq("alpha", "beta", "gamma"))).toDF("id", "cand", "ref")
    val r = OverlapEval.editEval(p).collect()(0)
    assert(r.getLong(4) == 2L && r.getLong(5) == 3L, s"got $r")
    // tokens past werCap are invisible to WER: these pairs agree on the
    // first 2 tokens and differ only at position 3
    val capped = Seq((1, Seq("a", "b", "X"), Seq("a", "b", "Y")))
      .toDF("id", "cand", "ref")
    val rc = OverlapEval.editEval(capped, werCap = 2).collect()(0)
    assert(rc.getLong(4) == 0L && rc.getLong(5) == 2L, s"got $rc")
  }

  test("rougeL: hand-computed LCS cases, micro-averaged P/R/F") {
    import spark.implicits._
    // LCS('a b c d', 'b a c x d') = 3; LCS('a a b', 'a b a') = 2
    val pairs = Seq(
      (1, Seq("a", "b", "c", "d"), Seq("b", "a", "c", "x", "d")),
      (2, Seq("a", "a", "b"), Seq("a", "b", "a")))
      .toDF("id", "cand", "ref")
    val r = OverlapEval.rougeL(pairs).collect()(0)
    assert(r.getLong(0) == 2L)                        // pairs
    assert(r.getLong(1) == 5L)                        // lcs 3 + 2
    assert(r.getLong(2) == 7L && r.getLong(3) == 8L)  // cand/ref tokens
    assert(r.getDouble(4) == 0.714286)                // p = 5/7
    assert(r.getDouble(5) == 0.625)                   // r = 5/8
    // f = 2pr/(p+r) from the unrounded p, r
    val (p, rr) = (5.0 / 7.0, 5.0 / 8.0)
    val f = BigDecimal(2.0 * p * rr / (p + rr))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(6) == f)
  }

  test("rougeL: identical pair scores 1; disjoint scores 0; cap windows the DP") {
    import spark.implicits._
    val same = Seq((1, Seq("x", "y", "z"), Seq("x", "y", "z")))
      .toDF("id", "cand", "ref")
    val s = OverlapEval.rougeL(same).collect()(0)
    assert(s.getDouble(4) == 1.0 && s.getDouble(5) == 1.0 && s.getDouble(6) == 1.0)
    val disj = Seq((1, Seq("x", "y"), Seq("a", "b"))).toDF("id", "cand", "ref")
    val d = OverlapEval.rougeL(disj).collect()(0)
    assert(d.getLong(1) == 0L && d.getDouble(6) == 0.0)
    // tokens past the cap are invisible: these agree only at position 3
    val capped = Seq((1, Seq("a", "b", "Q"), Seq("c", "d", "Q")))
      .toDF("id", "cand", "ref")
    val c = OverlapEval.rougeL(capped, cap = 2).collect()(0)
    assert(c.getLong(1) == 0L && c.getLong(2) == 2L)
  }

  test("lcs_len matches a reference implementation on random token arrays") {
    import spark.implicits._
    def ref(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
                   else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val rng = new scala.util.Random(7)
    val cases = (0 until 40).map { _ =>
      val a = Seq.fill(rng.nextInt(12))(s"t${rng.nextInt(5)}")
      val b = Seq.fill(rng.nextInt(12))(s"t${rng.nextInt(5)}")
      (a, b)
    }
    val got = cases.toDF("a", "b")
      .select(graft.functions.LcsLen.lcs_len(col("a"), col("b")))
      .collect().map(_.getInt(0))
    val want = cases.map { case (a, b) => ref(a, b) }
    assert(got.toSeq == want, "codegen'd LCS must match the 2-D reference DP")
  }

  test("editEval: empty sides degrade sanely") {
    import spark.implicits._
    val p = Seq(
      (1, Seq.empty[String], Seq("a", "b")), // all-insert: 2 word edits
      (2, Seq.empty[String], Seq.empty[String]))
      .toDF("id", "cand", "ref")
    val r = OverlapEval.editEval(p).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getLong(4) == 2L && r.getLong(5) == 2L, s"got $r")
  }
}

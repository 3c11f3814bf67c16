package graft

import graft.ops.UnigramLm
import org.apache.spark.sql.functions._

/** Unigram-LM (Kudo 2018) hard-EM trainer against a hand-computed
  * fixture: corpus {abab ×3, ab ×2, cd ×1}, maxPieceLen 2, seed 2.
  *
  * Hand derivation: candidate weights a=8, b=8, ab=8, ba=3, c=1, d=1;
  * seed keeps the top-2 multi pieces {ab:8, ba:3}; v0 adds all chars,
  * total 29. Under v0 costs, Viterbi gives abab→[ab,ab], ab→[ab],
  * cd→[c,d] (cd never made the seed), so round-1 counts are ab=8
  * (2·3 + 1·2), ba=0 (pruned), chars a,b unused (floored to 1), c=d=1.
  */
class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (Seq.fill(3)("abab") ++ Seq.fill(2)("ab") ++ Seq("cd"))
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  private def fixtureModel = UnigramLm.train(spark, corpus, "text",
    seedSize = 2, maxPieceLen = 2, rounds = 1)

  test("train: hand-computed EM round — counts, pruning, char floor") {
    val m = fixtureModel
    assert(m.counts.toMap == Map(
      "ab" -> 8L, "a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L),
      s"got ${m.counts}")
    val probs = UnigramLm.vocabTable(spark, m)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(probs("ab") == 0.666667 && probs("c") == 0.083333, probs.toString)
  }

  test("segmentStats: Viterbi under the trained model, pieces rebuild the word") {
    val got = UnigramLm.segmentStats(spark, corpus, "text", fixtureModel)
      .orderBy("word").as[(String, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      ("ab", 2L, 1L, "ab"), ("abab", 3L, 2L, "ab ab"), ("cd", 1L, 2L, "c d")),
      got.toString)
    got.foreach { case (w, _, _, seg) =>
      assert(seg.replace(" ", "") == w, s"$seg does not rebuild $w")
    }
  }

  test("viterbi: exact-cost ties prefer the longer piece; min cost wins otherwise") {
    val noUnk = Double.MaxValue / 4 // coverage tests: fallback must not fire
    // "a a" and "aa" both cost exactly 2.0 -> the longer piece wins
    assert(UnigramLm.viterbi("aa", Map("a" -> 1.0, "aa" -> 2.0), 2, noUnk)
      == Seq("aa"))
    // strictly cheaper split beats the longer piece
    assert(UnigramLm.viterbi("aa", Map("a" -> 0.5, "aa" -> 2.0), 2, noUnk)
      == Seq("a", "a"))
    // unreachable multi-char route falls back to chars
    assert(UnigramLm.viterbi("abc", Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0,
      "zz" -> 0.1), 2, noUnk) == Seq("a", "b", "c"))
  }

  test("viterbi: positions no vocab piece covers fall back to single-char UNK") {
    // 'x' is not in the vocab: the uncovered position becomes its own
    // piece at unkCost; covered neighbours still use the vocab
    assert(UnigramLm.viterbi("axb", Map("a" -> 1.0, "b" -> 1.0), 2, 50.0)
      == Seq("a", "x", "b"))
    // unkCost is strictly worse than any vocab piece: it never displaces
    // a covered path ("ab" stays one piece even with a tiny unkCost bias)
    assert(UnigramLm.viterbi("ab", Map("a" -> 1.0, "b" -> 1.0, "ab" -> 1.5), 2,
      50.0) == Seq("ab"))
  }

  test("segmentStats with a frozen model survives characters unseen at training") {
    // model trained WITHOUT digits or the letters x/q/z — applying it to
    // a NEW corpus containing them is the production frozen-model path
    // (pre-fix this threw "position unreachable" on the first such word)
    val m = fixtureModel // vocab over {a,b,c,d,ab}
    val applyCorpus = Seq(
      (1L, "ab x9z quab"),
      (2L, "abq7 cd")
    ).toDF("doc_id", "text")
    val got = UnigramLm.segmentStats(spark, applyCorpus, "text", m)
      .orderBy("word").as[(String, Long, Long, String)].collect().toSeq
    // every word segments, pieces rebuild the word, unseen chars come out
    // as their own single-char (implicit-UNK) pieces
    got.foreach { case (w, _, n, seg) =>
      assert(seg.replace(" ", "") == w, s"$seg does not rebuild $w")
      assert(n == seg.split(" ").length.toLong)
    }
    val byWord = got.map(g => g._1 -> g._4).toMap
    assert(byWord("ab") == "ab")       // covered words segment exactly as before
    assert(byWord("x9z") == "x 9 z")   // fully-unseen word: one UNK per char
    assert(byWord("quab") == "q u ab") // unseen prefix, covered suffix
    assert(byWord("abq7") == "ab q 7")
  }

  test("viterbi survives arbitrary unicode incl. surrogate pairs at the UNK floor") {
    // emoji = 2 UTF-16 units: the char-grain fallback still terminates
    // and the pieces concatenate back to the input
    val seg = UnigramLm.viterbi("a😀b", Map("a" -> 1.0, "b" -> 1.0),
      2, 50.0)
    assert(seg.mkString == "a😀b" && seg.length == 4, seg.toString)
  }

  test("train is invariant under repartitioning") {
    val a = fixtureModel.counts.toMap
    val b = UnigramLm.train(spark, corpus.repartition(13), "text",
      seedSize = 2, maxPieceLen = 2, rounds = 1).counts.toMap
    assert(a == b)
  }

  test("expectedMicro: hand-computed forward-backward posteriors") {
    // word "aa" under p(a)=0.5, p(aa)=0.25: paths [a,a] mass 0.25 and
    // [aa] mass 0.25, Z=0.5 — each path posterior 0.5, so E[a]=1.0
    // (two sites x 0.5) and E[aa]=0.5, in micro-units 1e6 and 5e5.
    val got = UnigramLm.expectedMicro("aa", 1L,
      Map("a" -> 0.5, "aa" -> 0.25), 2)
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    assert(got == Map("a" -> 1000000L, "aa" -> 500000L), got.toString)
    // wc scales linearly
    val scaled = UnigramLm.expectedMicro("aa", 3L,
      Map("a" -> 0.5, "aa" -> 0.25), 2)
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    assert(scaled == Map("a" -> 3000000L, "aa" -> 1500000L), scaled.toString)
  }

  test("lossPrune: the piece whose removal hurts most survives; chars always kept") {
    // cost(ab)=-ln(4/15); removing it forces [a,b] at 2x that cost
    // -> loss(ab) = 4 * (-ln(4/15)) ≈ 5.29. cd is rare AND its chars
    // are rare: loss(cd) = 1 * ln(15) ≈ 2.71. pruneTo=1 keeps ab.
    val m = UnigramLm.Model(Seq("ab" -> 4L, "cd" -> 1L,
      "a" -> 4L, "b" -> 4L, "c" -> 1L, "d" -> 1L), 2)
    val pruned = UnigramLm.lossPrune(m, pruneTo = 1)
    assert(pruned.counts.toMap == Map(
      "ab" -> 4L, "a" -> 4L, "b" -> 4L, "c" -> 1L, "d" -> 1L),
      pruned.counts.toString)
    // pruneTo >= #multi keeps everything
    assert(UnigramLm.lossPrune(m, 10).counts.toMap == m.counts.toMap)
  }

  test("soft-EM beats hard-EM on held-out marginal perplexity (ambiguous fixture)") {
    // a genuinely ambiguous corpus: every word segments several ways
    // under {a, b, ab, ba, aa, bb} pieces. Hard-EM commits each word's
    // whole count to its single Viterbi path (winner-take-all); soft-EM
    // spreads mass by posterior, which is what marginal likelihood
    // rewards. Held-out slice drawn from the same word distribution.
    def slice(k: Int) =
      (Seq.fill(6 * k)("abab") ++ Seq.fill(4 * k)("aba") ++
        Seq.fill(4 * k)("bab") ++ Seq.fill(2 * k)("ab") ++
        Seq.fill(2 * k)("ba") ++ Seq.fill(k)("aabb"))
    val train = slice(5).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val heldOut = slice(1)
    val hard = UnigramLm.train(spark, train, "text",
      seedSize = 4, maxPieceLen = 2, rounds = 3)
    val soft = UnigramLm.trainSoft(spark, train, "text",
      seedSize = 4, maxPieceLen = 2, rounds = 3)
    def nll(m: UnigramLm.Model): Double = {
      val unkP = 0.5 / m.total
      heldOut.map(w => UnigramLm.marginalNll(w, m.probs, 2, unkP)).sum
    }
    val (hn, sn) = (nll(hard), nll(soft))
    assert(sn < hn, s"soft-EM held-out NLL $sn should beat hard-EM $hn")
  }

  test("sampleSegment: posterior sampling follows the threshold rule exactly") {
    // "aa" under p(a)=0.5, p(aa)=0.25: alpha = [1, .5, .5]; at pos 2 the
    // candidates are l=1 (w = alpha(1)·p(a) = .25) then l=2 (w = .25);
    // the draw picks l=1 iff u·alpha(2) < .25 ⇔ u < .5
    val prob = Map("a" -> 0.5, "aa" -> 0.25)
    for (salt <- (0 until 50).map(i => s"s$i")) {
      val u = UnigramLm.drawUnit("aa", 2, salt)
      val got = UnigramLm.sampleSegment("aa", prob, 2, salt, unkP = 1e-9)
      val want = if (0.25 > u * 0.5) Seq("a", "a") else Seq("aa")
      assert(got == want, s"salt=$salt u=$u got=$got")
    }
    // both outcomes actually occur (the posterior is 50/50) — the
    // sampler is not argmax in disguise
    val outcomes = (0 until 100).map(i =>
      UnigramLm.sampleSegment("aa", prob, 2, s"t$i", unkP = 1e-9)).toSet
    assert(outcomes == Set(Seq("a", "a"), Seq("aa")), outcomes.toString)
  }

  test("sampleStats: pieces rebuild every word; unseen chars fall back to UNK") {
    val m = fixtureModel // vocab over {a,b,c,d,ab}
    val applyCorpus = Seq((1L, "abab x9z ab"), (2L, "cd abq")).toDF("doc_id", "text")
    val got = UnigramLm.sampleStats(spark, applyCorpus, "text", m)
      .as[(String, Long, Long, String)].collect().toSeq
    got.foreach { case (w, _, n, seg) =>
      assert(seg.replace(" ", "") == w, s"$seg does not rebuild $w")
      assert(n == seg.split(" ").length.toLong)
    }
    // fully-unseen word: every position rescued by the single-char UNK
    assert(got.find(_._1 == "x9z").get._4 == "x 9 z")
    // sampling is deterministic given the salt: same call, same paths
    val again = UnigramLm.sampleStats(spark, applyCorpus, "text", m)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got.sortBy(_._1) == again.sortBy(_._1))
  }

  test("trainSoft is invariant under repartitioning") {
    val a = UnigramLm.trainSoft(spark, corpus, "text",
      seedSize = 2, maxPieceLen = 2, rounds = 2, pruneTo = 1).counts.toMap
    val b = UnigramLm.trainSoft(spark, corpus.repartition(13), "text",
      seedSize = 2, maxPieceLen = 2, rounds = 2, pruneTo = 1).counts.toMap
    assert(a == b && a.nonEmpty, a.toString)
  }

  test("words beyond maxWordLen are excluded from training and segmentation") {
    val docs = Seq((1L, "short averyveryverylongword short")).toDF("doc_id", "text")
    val m = UnigramLm.train(spark, docs, "text", seedSize = 4,
      maxPieceLen = 3, rounds = 1, maxWordLen = 8)
    val segged = UnigramLm.segmentStats(spark, docs, "text", m, maxWordLen = 8)
      .select("word").as[String].collect().toSet
    assert(segged == Set("short"))
  }
}

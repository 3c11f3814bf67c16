package graft

import graft.ops.Bpe

/** BPE trainer against the Sennrich et al. (2016) reference example:
  * the corpus {low ×5, lower ×2, newest ×6, widest ×3} with an end-of-word
  * marker must learn the canonical merge sequence under the deterministic
  * tie-break (count desc, pair lexicographic asc).
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // one doc per word occurrence so the word-frequency dictionary is exact
  private def corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("train learns the canonical Sennrich merge sequence") {
    val rules = Bpe.train(spark, corpus, "text", nMerges = 6)
    // hand-derived: (e,s)=9 wins the 9-way tie lexicographically, then the
    // merged symbol chains, then (l,o)/(lo,w) at 7, then (e,w) at 6
    assert(rules == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w")), s"got $rules")
  }

  test("tokenize segments an UNSEEN word with the learned vocab") {
    val rules = Bpe.train(spark, corpus, "text", nMerges = 6)
    val toks = Bpe.tokenize(spark,
        Seq((42L, "lowest")).toDF("doc_id", "text"), "doc_id", "text", rules)
      .as[(Long, String)].collect().toSeq
    // the textbook result: "lowest" -> low + est</w>
    assert(toks == Seq((42L, "low"), (42L, "est</w>")), s"got $toks")
  }

  test("mergePair is left-to-right non-overlapping") {
    assert(Bpe.mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergePair(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.mergePair(Seq("x"), "a", "b") == Seq("x"))
    assert(Bpe.mergePair(Nil, "a", "b") == Nil)
  }

  test("train stops early when no pairs remain") {
    val tiny = Seq((1L, "a b")).toDF("doc_id", "text") // 1-char words: only marker pairs
    val rules = Bpe.train(spark, tiny, "text", nMerges = 10)
    // merges (a,</w>) and (b,</w>) exhaust every pair; no further rules
    assert(rules.size == 2 && rules.toSet ==
      Set(("a", "</w>"), ("b", "</w>")), s"got $rules")
  }

  test("train agrees with an in-memory reference BPE on random corpora") {
    // reference implementation: plain Scala fold over a word-count map,
    // same tie-break (count desc, then (a, b) lexicographic asc)
    def refTrain(words: Seq[String], nMerges: Int): Seq[(String, String)] = {
      var dict: Map[Seq[String], Long] = words.groupBy(identity)
        .map { case (w, g) => (w.map(_.toString) :+ "</w>", g.size.toLong) }
      val out = Seq.newBuilder[(String, String)]
      var continue = true
      var i = 0
      while (i < nMerges && continue) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        dict.foreach { case (syms, c) =>
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
        }
        if (counts.isEmpty) continue = false
        else {
          val (a, b) = counts.toSeq
            .sortBy { case ((x, y), c) => (-c, x, y) }.head._1
          out += ((a, b))
          dict = dict.toSeq.map { case (syms, c) =>
            (graft.ops.Bpe.mergePair(syms, a, b), c)
          }.groupBy(_._1).map { case (s, g) => (s, g.map(_._2).sum) }
          i += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      // small vocab + short words force heavy pair ties — the regime
      // where a wrong tie-break diverges immediately
      val words = Seq.fill(30)(
        (0 until 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val got = Bpe.train(spark, docs, "text", nMerges = 5)
      val want = refTrain(words, nMerges = 5)
      assert(got == want, s"trial $trial: got $got want $want (corpus $words)")
    }
  }

  test("pairCounts matches a hand count on the reference corpus") {
    val got = Bpe.pairCounts(spark, corpus, "text")
      .as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got(("e", "s")) == 9L)   // newest 6 + widest 3
    assert(got(("w", "e")) == 8L)   // lower 2 + newest 6
    assert(got(("l", "o")) == 7L)
    assert(got(("t", "</w>")) == 9L)
    assert(got(("w", "</w>")) == 5L) // low's marker pair
  }
}

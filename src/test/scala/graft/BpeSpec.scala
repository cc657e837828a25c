package graft

import graft.text.BpeMerges

/** BPE merge learning (x22): hand-computed fixture (the standard
  * hug/pug/pun/bun/hugs teaching corpus), greedy-overlap semantics,
  * and the gated query's shape. */
class BpeSpec extends SparkTestBase {

  test("unigram Viterbi: true DP (beats greedy), ties resolve, cap " +
    "holds, closed form matches, uncoverable fails loudly") {
    import graft.text.UnigramTokenizer.segment
    val singles = ('a' to 'z').map(c => c.toString -> -3.0).toMap
    // greedy longest-match would take ab+c (−7); the DP finds a+bc
    val dp = singles ++ Map("ab" -> -4.0, "bc" -> -3.5)
    assert(segment("abc", dp) == Seq("a", "bc"))
    // equal score (aa = −6 either way) → fewer tokens wins
    assert(segment("aa", singles ++ Map("aa" -> -6.0)) == Seq("aa"))
    // the pinned gate vocab's closed form on hand fixtures
    val gv = graft.text.UnigramTokenizer.GateVocab
    assert(segment("the", gv) == Seq("the"))
    assert(segment("thethe", gv) == Seq("the", "the"))
    assert(segment("tth", gv) == Seq("t", "th"))
    assert(segment("hat", gv).length == 3)
    assert(segment("thet", gv) == Seq("the", "t"))
    // 64-char word cap (mirrored by left(w, 64) in the oracle)
    assert(segment("z" * 100, gv).length == 64)
    // a character outside the vocab is a loud error, not a skip
    val e = intercept[IllegalArgumentException] {
      segment("ab1", singles)
    }
    assert(e.getMessage.contains("vocabulary"))
  }

  test("unigram fit: deterministic, recovers planted pieces, prunes " +
    "junk, compresses vs chars") {
    import graft.text.UnigramTokenizer
    // planted corpus: 'the'/'ing' dominate; 'zq' appears once
    val corpus = Seq(("the", 500L), ("thing", 300L), ("sing", 200L),
      ("theme", 150L), ("cat", 100L), ("zq", 1L))
    val fit1 = UnigramTokenizer.learn(corpus, targetSize = 20)
    val fit2 = UnigramTokenizer.learn(corpus, targetSize = 20)
    assert(fit1 == fit2, "fit must be deterministic")
    val vocab = fit1.toMap
    // 'the' must survive outright; the '-ing' mass must be covered by
    // SOME surviving multi-char piece (EM may legitimately pick
    // 'hing'/'sing' over bare 'ing' — 4-char pieces score higher)
    assert(vocab.contains("the"),
      s"dominant piece must survive: ${fit1.map(_._1)}")
    assert(vocab.keys.exists(p => p.length > 1 && p.contains("ing")),
      s"the -ing mass must keep a multi-char piece: ${fit1.map(_._1)}")
    assert(!vocab.contains("zq"), "sub-floor junk must never seed")
    // tokenizing the corpus with the fit beats char tokenization
    val tok = UnigramTokenizer.tokenCounter(vocab)
    val (nTok, nChar) = corpus.map { case (w, f) =>
      (tok(w) * f, w.length.toLong * f)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(nTok < nChar, s"fit must compress: $nTok vs $nChar")
    // chars never prune: every corpus char is still coverable
    corpus.foreach { case (w, _) =>
      assert(UnigramTokenizer.segment(w, vocab).nonEmpty)
    }
    // the x51b closed form, pinned at the UNIT level (the oracle
    // gates engine parity; this pins the DERIVATION): a corpus of
    // distinct 4-char words at seed frequency — including a shared
    // 3-char substring ('the' in them/then, which seeds and must
    // prune unused — the adversarial case) — fixes at logp(word) =
    // ln(f/F) with every char at the unused ln(0.5/F) floor
    val planted = Seq(("them", 50L), ("then", 30L), ("wing", 20L))
    val fitP = UnigramTokenizer.learn(planted).toMap
    val fTot = 100.0
    planted.foreach { case (w, f) =>
      assert(math.abs(fitP(w) - math.log(f / fTot)) < 1e-12,
        s"$w: ${fitP(w)} vs ${math.log(f / fTot)}")
    }
    val plantedChars = planted.flatMap(_._1.toSeq).map(_.toString).distinct
    plantedChars.foreach { c =>
      assert(math.abs(fitP(c) - math.log(0.5 / fTot)) < 1e-12, c)
    }
    assert(fitP.size == planted.size + plantedChars.size,
      s"unexpected survivors: ${fitP.keys.toSeq.sorted}")

    // the targetSize contract is a HARD cap on multi-char pieces
    // (final-round prune, ADVICE r10) — even a cap far below the
    // candidate count is honored, and chars still never prune
    val tight = UnigramTokenizer.learn(corpus, targetSize = 2)
    assert(tight.count(_._1.length > 1) <= 2,
      s"targetSize=2 exceeded: ${tight.map(_._1)}")
    corpus.foreach { case (w, _) =>
      assert(UnigramTokenizer.segment(w, tight.toMap).nonEmpty)
    }
  }

  test("mergePair consumes greedily left-to-right") {
    assert(BpeMerges.mergePair(Seq("a", "a", "a"), "a", "a") ==
      Seq("aa", "a"))
    assert(BpeMerges.mergePair(Seq("h", "u", "g"), "u", "g") ==
      Seq("h", "ug"))
    assert(BpeMerges.mergePair(Seq("x"), "u", "g") == Seq("x"))
  }

  test("learn reproduces the hand-computed merge sequence") {
    import spark.implicits._
    // weighted pair counts: (u,g)=20 > (p,u)=17 > (u,n)=16 > (h,u)=15
    // merge1 (u,g): then (u,n)=16 > (h,ug)=15 > (p,u)=12
    // merge2 (u,n): then (h,ug)=15 > (p,un)=12
    // merge3 (h,ug)
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L),
      ("bun", 4L), ("hugs", 5L)).toDS()
    val merges = BpeMerges.learn(words, 3)
    assert(merges == Seq(
      (0, "u", "g", 20L),
      (1, "u", "n", 16L),
      (2, "h", "ug", 15L)))
  }

  test("ties break lexicographically — the table is deterministic") {
    import spark.implicits._
    // "ab" and "cd" both appear with weight 7; (a,b) < (c,d)
    val words = Seq(("ab", 7L), ("cd", 7L)).toDS()
    val merges = BpeMerges.learn(words, 1)
    assert(merges == Seq((0, "a", "b", 7L)))
  }

  test("applyMerges replays the table in rank order") {
    // after (u,g), (u,n), (h,ug): hugs → [hug, s], pun → [p, un]
    val merges = Seq(("u", "g"), ("u", "n"), ("h", "ug"))
    assert(BpeMerges.applyMerges("hugs", merges) == Seq("hug", "s"))
    assert(BpeMerges.applyMerges("pun", merges) == Seq("p", "un"))
    assert(BpeMerges.applyMerges("bug", merges) == Seq("b", "ug"))
  }

  test("x23 tokenize: merges only ever shrink the token count") {
    val rows = BpeMerges.x23BpeTokenize(spark, sfSmoke).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"doc ${r.getLong(0)}: BPE tokens exceed char tokens")
    }
    // the 12 merges must buy real compression somewhere
    assert(rows.map(r => r.getLong(1) - r.getLong(2)).sum > 0)
  }

  test("x22 gated query: ranked merges over sf0.001 documents") {
    val rows = BpeMerges.x22BpeMerges(spark, sfSmoke).collect()
    // the 31-word synthetic vocab exhausts its pairs well before the
    // 1000-merge cap — the loop must terminate early, not pad
    assert(rows.length > 12 && rows.length < 1000)
    assert(rows.map(_.getInt(0)).toSeq == (0 until rows.length))
    // counts are non-increasing only weakly across ranks is NOT
    // guaranteed by BPE (a merge can create a new frequent pair), but
    // every count is positive and every merged symbol non-empty
    rows.foreach { r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
      assert(r.getLong(3) > 0)
    }
  }

  test("x22b gate is the exact 12-row prefix of the full fit") {
    val full = BpeMerges.x22BpeMerges(spark, sfSmoke).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val gate = BpeMerges.x22bBpeMergesGate(spark, sfSmoke).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(gate.length == 12)
    // greedy BPE is prefix-deterministic: the gate's 12 rows ARE the
    // head of the 1000-cap table, so the DuckDB replay that
    // hash-gates the gate transitively pins the full fit's mechanism
    assert(gate.toSeq == full.take(12).toSeq)
  }

  test("learnLocal reproduces the distributed merge table exactly") {
    import spark.implicits._
    val vocab = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L),
      ("bun", 4L), ("hugs", 5L), ("ab", 7L), ("cd", 7L))
    val dist = BpeMerges.learn(vocab.toDS(), 8)
    val local = BpeMerges.learnLocal(vocab, 8)
    assert(local == dist)
    // and on the real sf0.001 word-frequency table, full exhaustion
    val words = BpeMerges.wordFreqs(spark, sfSmoke)
    assert(BpeMerges.learnLocal(words.collect().toSeq, 40) ==
      BpeMerges.learn(words, 40))
  }

  test("learnLocal reaches 1000 merges on a synthetic vocab") {
    // deterministic pseudo-random 4000-word vocab with a rich symbol
    // inventory — enough pair diversity to sustain 1000 merges
    val rng = new scala.util.Random(42)
    val vocab = (0 until 4000).map { i =>
      val len = 6 + rng.nextInt(10)
      val w = (0 until len)
        .map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      (w + i.toString.map(c => ('a' + (c - '0')).toChar), // unique
        1L + rng.nextInt(100))
    }
    val t0 = System.nanoTime()
    val merges = BpeMerges.learnLocal(vocab, 1000)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(merges.length == 1000, s"only ${merges.length} merges")
    assert(merges.map(_._1) == (0 until 1000))
    // driver-local fit must be fast — this is the path that replaces
    // 1000 Spark jobs
    assert(sec < 30.0, f"learnLocal took $sec%.1f s")
  }

  test("x23 reuses x22's cached fit (no duplicate learn)") {
    val a = BpeMerges.learnedMerges(spark, sfSmoke)
    val b = BpeMerges.learnedMerges(spark, sfSmoke)
    assert(a eq b, "fit cache must return the memoized table")
  }
}

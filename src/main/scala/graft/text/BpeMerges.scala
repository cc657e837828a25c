package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed BPE merge learning (tokenizer training) — the step a
  * training-data estate runs BEFORE token counting is even defined:
  * learn the top-k byte-pair merges from corpus statistics (Sennrich
  * et al. 2016, the algorithm behind GPT/Llama-family tokenizers).
  *
  * Scale shape — the part that matters at 100 TB:
  *  1. corpus → (word, freq): ONE corpus-scale shuffle, after which
  *     the working set is the distinct-word vocabulary (sub-linear in
  *     corpus size by Heaps' law; millions of rows at 100 TB, not
  *     billions). Classic word-frequency BPE: every later iteration
  *     touches only the vocab, never the corpus again.
  *  2. the merge loop runs DRIVER-LOCAL over the collected vocab
  *     ([[learnLocal]], incremental pair-count maintenance — only
  *     words containing the merged pair are touched per iteration),
  *     capped at [[VocabCap]] rows so the collect is bounded by
  *     construction. One Spark job per merge (the round-6 shape,
  *     kept as [[learn]]) cannot reach 32k-merge production vocabs —
  *     32k driver-loop jobs; the vocab being bounded post-shuffle is
  *     exactly what licenses finishing the fit locally.
  *
  * The within-word re-segmentation is a genuinely sequential
  * left-to-right fold over ≤64 symbols (overlaps: merging "aa" in
  * "aaa" must consume greedily), so it runs as a typed map — the
  * same justification as x8's next-fit packing; everything
  * corpus-scale stays in Catalyst.
  *
  * Determinism: ties on pair count break on (left, right) ascending,
  * so the merge table is a pure function of the corpus, and
  * [[learnLocal]] reproduces [[learn]]'s table exactly (BpeSpec
  * pins the parity). Rows-only gate (k-step argmax recursion is not
  * expressible as one SQL query); BpeSpec pins the merges on a
  * hand-computed fixture and x22's output shape at sf0.001.
  */
object BpeMerges {

  private val WordLimit = 64

  /** Merge count for the gated x22/x23 queries. The loop stops early
    * when the vocab's pairs exhaust (fully-merged words), so on a
    * small corpus the table is shorter than this cap. */
  private[graft] val Merges = 1000

  /** Bounded-collect cap for [[learnScalable]]: the driver sees at
    * most this many (word, freq) rows — the top of the frequency
    * distribution, where all pair mass lives (Zipf: the truncated
    * tail contributes negligibly to pair statistics). ~128k words ×
    * ≤64 chars ≈ tens of MB driver-side, bounded by construction. */
  private[graft] val VocabCap = 1 << 17

  /** Corpus → (word, freq) — the ONE corpus-scale shuffle, shared by
    * x22 and x23 (same whitespace-split, lowercase-letter word
    * convention as x1/x7's token stream: runs of [a-z]+ only, so
    * punctuation and digits never pollute the pair statistics). */
  private[graft] def wordFreqs(s: SparkSession, dir: String)
      : Dataset[(String, Long)] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("f"))
      .as[(String, Long)]
  }

  /** (word, freq) → symbol sequences. Words cap at [[WordLimit]]
    * chars (longer = URLs/junk; unbounded words would make the
    * per-iteration explode quadratic in the outlier). */
  private def toSymbols(words: Dataset[(String, Long)])
      : Dataset[(Seq[String], Long)] = {
    import words.sparkSession.implicits._
    words.map { case (w, f) =>
      (w.take(WordLimit).map(_.toString): Seq[String], f)
    }
  }

  /** Greedy left-to-right merge of one adjacent pair inside a word:
    * "aaa" under merge (a,a) → ["aa","a"] (the first match consumes
    * both symbols; scanning resumes AFTER it). */
  private[graft] def mergePair(syms: Seq[String], left: String,
      right: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Learn `k` merges from a (word, freq) vocabulary with one Spark
    * job per merge — the distributed truth twin, kept for when even
    * the vocab exceeds driver memory. Production fits of realistic
    * merge counts go through [[learnScalable]]; BpeSpec pins that
    * both paths produce the identical table. */
  def learn(words: Dataset[(String, Long)], k: Int)
      : Seq[(Int, String, String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    var vocab = toSymbols(words).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < k && !done) {
      // weighted adjacent-pair counts over the vocab (not the corpus)
      val best = vocab.flatMap { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1))
          .map { case (a, b) => ((a, b), f) }
      }.toDF("pair", "f")
        .groupBy("pair").agg(sum("f").as("n"))
        .orderBy(col("n").desc, col("pair._1"), col("pair._2"))
        .limit(1) // one-row argmax collect, bounded by construction
        .collect()
      if (best.isEmpty) done = true
      else {
        val r = best.head
        val p = r.getStruct(0)
        val (l, rt, n) = (p.getString(0), p.getString(1), r.getLong(1))
        merges += ((rank, l, rt, n))
        val prev = vocab
        vocab = vocab.map { case (syms, f) =>
          (mergePair(syms, l, rt), f)
        }.localCheckpoint()
        prev.unpersist()
        rank += 1
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Driver-local merge loop over a collected (word, freq) vocab —
    * the path that reaches realistic merge counts. Incremental: pair
    * counts and a pair→words index are maintained across iterations,
    * so each merge touches ONLY the words containing the chosen pair
    * (the classic BPE-trainer update, vs. re-scanning the vocab).
    * Identical determinism contract to [[learn]]: argmax on count,
    * ties broken (left, right) ascending. */
  private[graft] def learnLocal(vocab: Seq[(String, Long)], k: Int)
      : Seq[(Int, String, String, Long)] = {
    val words = vocab.iterator.map { case (w, f) =>
      (mutable.ArrayBuffer(w.take(WordLimit).map(_.toString): _*), f)
    }.toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addWord(i: Int): Unit = {
      val (syms, f) = words(i)
      var j = 0
      while (j + 1 < syms.length) {
        val p = (syms(j), syms(j + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
        index.getOrElseUpdate(p, mutable.BitSet.empty) += i
        j += 1
      }
    }
    def dropWord(i: Int): Unit = {
      val (syms, f) = words(i)
      var j = 0
      while (j + 1 < syms.length) {
        val p = (syms(j), syms(j + 1))
        val n = counts(p) - f
        if (n <= 0L) { counts.remove(p); index.remove(p) }
        else counts(p) = n
        j += 1
      }
      // a surviving pair may still index this word via another
      // occurrence; clear defensively (cheap: ≤63 pairs per word)
      var m = 0
      while (m + 1 < syms.length) {
        index.get((syms(m), syms(m + 1))).foreach(_ -= i)
        m += 1
      }
    }
    words.indices.foreach(addWord)
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    while (rank < k && counts.nonEmpty) {
      // linear argmax scan per iteration: |distinct pairs| is bounded
      // by the vocab's symbol inventory, small relative to the corpus;
      // a lazy-deletion heap would shave this at extreme vocab sizes
      var bestP: (String, String) = null
      var bestN = Long.MinValue
      counts.foreach { case (p, n) =>
        if (n > bestN || (n == bestN &&
            (p._1 < bestP._1 ||
              (p._1 == bestP._1 && p._2 < bestP._2)))) {
          bestP = p; bestN = n
        }
      }
      merges += ((rank, bestP._1, bestP._2, bestN))
      val touched = index(bestP).toArray // snapshot: dropWord mutates
      touched.foreach { i =>
        dropWord(i)
        val (syms, f) = words(i)
        val merged = mergePair(syms.toSeq, bestP._1, bestP._2)
        words(i) = (mutable.ArrayBuffer(merged: _*), f)
        addWord(i)
      }
      rank += 1
    }
    merges.toSeq
  }

  /** The production fit: ONE corpus shuffle to (word, freq), a
    * bounded collect of the top-[[VocabCap]] rows (freq desc, word
    * asc — deterministic truncation), then [[learnLocal]] for the
    * full merge loop. At testdata scales the vocab is far under the
    * cap, so the fit is exact. */
  def learnScalable(words: Dataset[(String, Long)], k: Int)
      : Seq[(Int, String, String, Long)] = {
    import words.sparkSession.implicits._
    val vocab = words.toDF("word", "f")
      .orderBy(col("f").desc, col("word"))
      .limit(VocabCap)
      .as[(String, Long)]
      .collect() // bounded by VocabCap by construction
    learnLocal(vocab.toSeq, k)
  }

  /** Per-(applicationId, dir, k) memo of the learned table so x23
    * (and repeated bench runs in one session) reuse x22's fit instead
    * of re-running it. Keyed by applicationId like clusterCache /
    * keptCache: a long-lived JVM that regenerates the parquet under
    * `dir` and opens a NEW session must re-fit, not serve the old
    * corpus's merge table. The table is ≤k small tuples; memory is
    * trivial. */
  private val fitCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int), Seq[(Int, String, String, Long)]]()

  private[graft] def learnedMerges(s: SparkSession, dir: String,
      k: Int = Merges): Seq[(Int, String, String, Long)] =
    fitCache.computeIfAbsent((s.sparkContext.applicationId, dir, k),
      _ => learnScalable(wordFreqs(s, dir), k))

  /** X22 — learn up to [[Merges]] merges from the `documents` corpus
    * (driver-local loop over the bounded collected vocab; terminates
    * early when the vocab is fully merged). */
  def x22BpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    learnedMerges(s, dir).toDF("rank", "left", "right", "pair_count")
  }

  /** Apply an ORDERED merge table to one word — the inference side
    * of BPE: replay the merges in learned rank order. A hash-set of
    * the word's current adjacent pairs gates each merge (O(1) probe
    * vs an O(len) scan), so a 1000-entry table costs 1000 probes plus
    * O(len) work only for the ≤len merges that actually fire —
    * behavior identical to the naive replay. */
  private[graft] def applyMerges(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.take(WordLimit).map(_.toString)
    if (syms.length < 2) return syms
    val present = mutable.HashSet.empty[(String, String)]
    def rebuild(): Unit = {
      present.clear()
      var i = 0
      while (i + 1 < syms.length) {
        present += ((syms(i), syms(i + 1))); i += 1
      }
    }
    rebuild()
    val it = merges.iterator
    while (it.hasNext && syms.length > 1) {
      val m = it.next()
      if (present.contains(m)) {
        syms = mergePair(syms, m._1, m._2)
        rebuild()
      }
    }
    syms
  }

  /** X23 — tokenize the corpus with the learned merges (the
    * production consumer of x22's table): per-document BPE token
    * counts plus the corpus-level compression the merges buy over
    * character tokenization. The fit is read from [[learnedMerges]]'s
    * session cache (ADVICE r6: no duplicate learn when x22 already
    * ran); the apply pass is one embarrassingly-parallel map over
    * documents — no shuffle at all after the fit. A per-partition
    * word→tokens memo exploits Zipf repetition (distinct words per
    * partition ≈ vocab size, bounded; the cap guards pathological
    * corpora). Rows-only gate (depends on the learned table); BpeSpec
    * pins the fixture tokenization. */
  /** Per-partition memoized word→BPE-token-count function — the one
    * inference kernel, shared by x23 and the pipeline's x26 so the
    * memo policy (cap, overflow fallthrough) cannot drift between
    * them. Vocabularies are Zipfian: the memo turns the per-word
    * merge replay into a hash probe for all but the long tail; the
    * cap bounds executor memory on adversarial inputs. */
  private[graft] def tokenCounter(
      merges: Seq[(String, String)]): String => Long = {
    val MemoCap = 1 << 20
    val memo = mutable.HashMap.empty[String, Long]
    w =>
      if (memo.size < MemoCap)
        memo.getOrElseUpdate(w, applyMerges(w, merges).length.toLong)
      else applyMerges(w, merges).length.toLong
  }

  def x23BpeTokenize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = learnedMerges(s, dir).map { case (_, l, r, _) => (l, r) }
    Tables.documents(s, dir)
      .select(col("doc_id"), expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)").as("words"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val tokens = tokenCounter(merges)
        it.map { case (id, words) =>
          val chars = words.map(_.take(WordLimit).length.toLong).sum
          val toks = words.map(tokens).sum
          (id, chars, toks)
        }
      }
      .toDF("doc_id", "n_char_tokens", "n_bpe_tokens")
  }

  /** Merge count for the [[x22bBpeMergesGate]] oracle gate: small
    * enough that the DuckDB replay (one MATERIALIZED CTE pair per
    * step) stays sub-second at sf0.1, large enough to exercise every
    * fit mechanism several times over — weighted pair counting, the
    * (count desc, left, right) argmax tie-break, and greedy
    * left-to-right merge application including the multi-character
    * ranks that only appear after earlier merges land. */
  private[graft] val GateMerges = 12

  /** X22B — the BPE-fit ORACLE GATE (the n7 pattern, for the
    * tokenizer trainer): the first [[GateMerges]] rows of the learned
    * merge table, which the DuckDB oracle re-derives INDEPENDENTLY by
    * replaying the fit — per step, weighted adjacent-pair counts over
    * the current vocabulary segmentation, argmax with the identical
    * tie-break, then the greedy left-to-right merge as a list_reduce
    * fold (the accumulator is the merged word joined on '~', a
    * character the [a-z]+ word convention excludes; "last symbol = l
    * and next = r → replace last with lr" replicates the
    * skip-after-merge scan exactly, because lr ≠ l for nonempty r).
    * Greedy BPE is a prefix-deterministic sequence, so gating the
    * first 12 merges value-gates the machinery the full 1000-cap
    * x22/x23 run on; the full table stays rows-only (a 1000-step SQL
    * unroll buys no additional coverage at real oracle cost). */
  def x22bBpeMergesGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    learnedMerges(s, dir).take(GateMerges)
      .toDF("rank", "left", "right", "pair_count")
  }

  /** One replay step of the oracle: p$i picks step i's merge from
    * v${i-1}'s segmentation; v$i applies it. MATERIALIZED is
    * load-bearing — DuckDB inlines plain CTEs, and a 12-step chain
    * re-evaluated per reference is exponential. */
  private def bpeGateStepSql(i: Int): String = {
    val prev = s"v${i - 1}"
    s"""p$i AS MATERIALIZED (
       |  SELECT z[1] AS pa, z[2] AS pb, sum(f) AS n
       |  FROM (SELECT f, unnest(list_zip(syms[1:len(syms)-1], syms[2:])) AS z
       |        FROM $prev WHERE len(syms) >= 2)
       |  GROUP BY 1, 2 ORDER BY n DESC, pa, pb LIMIT 1),
       |v$i AS MATERIALIZED (
       |  SELECT f, CASE WHEN len(syms) < 2 THEN syms
       |    ELSE string_split(
       |      list_reduce(syms, (acc, x) -> CASE
       |        WHEN regexp_extract(acc, '[^~]*$$') = p$i.pa AND x = p$i.pb
       |        THEN concat(
       |          left(acc, length(acc) - length(regexp_extract(acc, '[^~]*$$'))),
       |          p$i.pa, p$i.pb)
       |        ELSE concat(acc, '~', x) END), '~') END AS syms
       |  FROM $prev, p$i)""".stripMargin
  }

  /** The shared fit-replay CTE chain (corpus words → capped vocab →
    * v0 char split → p1/v1 … p12/v12) — the x22b oracle reads the
    * p$i argmax rows; the x23b oracle additionally APPLIES the p$i
    * merges to the document words. */
  private def bpeGateFitCtes: String = {
    val steps = (1 to GateMerges).map(bpeGateStepSql).mkString(",\n")
    s"""words AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |  FROM documents),
       |vcap AS (
       |  SELECT word, cast(count(*) AS bigint) AS f FROM words
       |  GROUP BY word ORDER BY f DESC, word LIMIT $VocabCap),
       |v0 AS (
       |  SELECT f, regexp_extract_all(substr(word, 1, $WordLimit), '.') AS syms
       |  FROM vcap),
       |$steps""".stripMargin
  }

  private[graft] def bpeGateOracleSql: String = {
    val out = (1 to GateMerges).map(i =>
      s"""SELECT cast(${i - 1} AS int) AS rank, pa AS "left",
         |  pb AS "right", cast(n AS bigint) AS pair_count FROM p$i"""
        .stripMargin).mkString("\nUNION ALL\n")
    s"""WITH ${bpeGateFitCtes}
       |SELECT * FROM ($out)""".stripMargin
  }

  /** X23B — the TOKENIZER ORACLE GATE (x22b's replay machinery,
    * pointed at the INFERENCE side): per-document BPE token counts
    * under the gated [[GateMerges]]-merge prefix vocabulary. The
    * Spark side runs the EXACT production kernel x23 and x26 use
    * ([[tokenCounter]] → [[applyMerges]] → [[mergePair]]) with the
    * first 12 learned merges; the oracle re-derives those merges
    * independently (the x22b chain) and then APPLIES them to every
    * distinct document word with the same list_reduce fold, one u$i
    * CTE per rank — rank order is exactly the ordered replay
    * [[applyMerges]] performs (its pair-presence probe is a pure
    * skip optimization: applying an absent merge is a no-op).
    * Distinct words tokenize once (the same Zipf memo argument as
    * the kernel's); per-doc counts come back through a (doc_id,
    * word, multiplicity) join, LEFT so wordless documents keep
    * their 0. This value-gates the inference kernel end to end —
    * x23's full-table run (and x26's token counts) differ only in
    * merge-table LENGTH, which the prefix-deterministic fit (x22b)
    * already gates. */
  def x23bBpeTokenizeGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = learnedMerges(s, dir).take(GateMerges)
      .map { case (_, l, r, _) => (l, r) }
    Tables.documents(s, dir)
      .select(col("doc_id"), expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)").as("words"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val tokens = tokenCounter(merges)
        it.map { case (id, words) => (id, words.map(tokens).sum) }
      }
      .toDF("doc_id", "n_bpe_tokens_12")
  }

  /** One merge-application step over the distinct-word table: u$i =
    * u${i-1} with step i's (pa, pb) merged greedily left-to-right —
    * the v$i fold, applied to document words instead of the vocab. */
  private def bpeApplyStepSql(i: Int): String = {
    val prev = if (i == 1) "u0" else s"u${i - 1}"
    s"""u$i AS MATERIALIZED (
       |  SELECT word, CASE WHEN len(syms) < 2 THEN syms
       |    ELSE string_split(
       |      list_reduce(syms, (acc, x) -> CASE
       |        WHEN regexp_extract(acc, '[^~]*$$') = p$i.pa AND x = p$i.pb
       |        THEN concat(
       |          left(acc, length(acc) - length(regexp_extract(acc, '[^~]*$$'))),
       |          p$i.pa, p$i.pb)
       |        ELSE concat(acc, '~', x) END), '~') END AS syms
       |  FROM $prev, p$i)""".stripMargin
  }

  private[graft] def bpeTokenizeGateOracleSql: String = {
    val apply = (1 to GateMerges).map(bpeApplyStepSql).mkString(",\n")
    s"""WITH ${bpeGateFitCtes},
       |dw AS (
       |  SELECT doc_id, word, cast(count(*) AS bigint) AS cnt
       |  FROM (SELECT doc_id,
       |          unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |        FROM documents)
       |  GROUP BY 1, 2),
       |u0 AS (
       |  SELECT word, regexp_extract_all(substr(word, 1, $WordLimit), '.') AS syms
       |  FROM (SELECT DISTINCT word FROM dw)),
       |$apply,
       |tok AS (SELECT word, cast(len(syms) AS bigint) AS n
       |        FROM u$GateMerges)
       |SELECT d.doc_id,
       |  cast(coalesce(sum(dw.cnt * tok.n), 0) AS bigint)
       |    AS n_bpe_tokens_12
       |FROM (SELECT doc_id FROM documents) d
       |LEFT JOIN dw ON dw.doc_id = d.doc_id
       |LEFT JOIN tok ON tok.word = dw.word
       |GROUP BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x22_bpe_merges" -> x22BpeMerges,
    "x22b_bpe_merges_gate" -> x22bBpeMergesGate,
    "x23_bpe_tokenize" -> x23BpeTokenize,
    "x23b_bpe_tokenize_gate" -> x23bBpeTokenizeGate)

  val oracle: Map[String, String] = Map(
    "x22b_bpe_merges_gate" -> bpeGateOracleSql,
    "x23b_bpe_tokenize_gate" -> bpeTokenizeGateOracleSql)
}

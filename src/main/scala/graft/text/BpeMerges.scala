package graft.text

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
  *  2. k merge iterations, each = explode adjacent symbol pairs
  *     weighted by word freq → one hash agg → a ONE-ROW argmax
  *     collect (bounded by construction) → re-segment words that
  *     contain the merged pair. localCheckpoint between iterations
  *     truncates the k-deep lineage exactly as d6's label
  *     propagation does.
  *
  * The within-word re-segmentation is a genuinely sequential
  * left-to-right fold over ≤64 symbols (overlaps: merging "aa" in
  * "aaa" must consume greedily), so it runs as a typed map — the
  * same justification as x8's next-fit packing; everything
  * corpus-scale stays in Catalyst.
  *
  * Determinism: ties on pair count break on (left, right) ascending,
  * so the merge table is a pure function of the corpus. Rows-only
  * gate (k-step argmax recursion is not expressible as one SQL
  * query); BpeSpec pins the merges on a hand-computed fixture and
  * x22's output shape at sf0.001.
  */
object BpeMerges {

  /** One learned merge: `rank`-th iteration chose (left, right) with
    * weighted adjacent-pair frequency `pair_count`. */
  private val WordLimit = 64

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

  /** Learn `k` merges from a (word, freq) vocabulary. Returns the
    * merge table ordered by rank. */
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

  /** X22 — learn 12 merges from the `documents` corpus (same
    * whitespace-split, lowercase-letter word convention as x1/x7's
    * token stream: runs of [a-z]+ only, so punctuation and digits
    * never pollute the pair statistics). */
  def x22BpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("f"))
      .as[(String, Long)]
    learn(words, 12)
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Apply an ORDERED merge table to one word — the inference side
    * of BPE: replay the merges in learned rank order. */
  private[graft] def applyMerges(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.take(WordLimit).map(_.toString)
    merges.foreach { case (l, r) => syms = mergePair(syms, l, r) }
    syms
  }

  /** X23 — tokenize the corpus with the learned merges (the
    * production consumer of x22's table): per-document BPE token
    * counts plus the corpus-level compression the 12 merges buy over
    * character tokenization. The merge table is 12 rows on the
    * driver (already collected by `learn`); the apply pass is one
    * embarrassingly-parallel map over documents — no shuffle at all
    * after the x22 fit. At 100 TB the fit runs once on the vocab and
    * the apply is a scan-level transform of every later ingest.
    * Rows-only gate (depends on the learned table); BpeSpec pins the
    * fixture tokenization. */
  def x23BpeTokenize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = learn(
      Tables.documents(s, dir)
        .select(explode(expr(
          "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
        .groupBy("word").agg(count(lit(1)).cast("long").as("f"))
        .as[(String, Long)], 12)
      .map { case (_, l, r, _) => (l, r) }
    Tables.documents(s, dir)
      .select(col("doc_id"), expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)").as("words"))
      .as[(Long, Seq[String])]
      .map { case (id, words) =>
        val chars = words.map(_.take(WordLimit).length.toLong).sum
        val toks = words.map(w => applyMerges(w, merges).length.toLong).sum
        (id, chars, toks)
      }
      .toDF("doc_id", "n_char_tokens", "n_bpe_tokens")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x22_bpe_merges" -> x22BpeMerges,
    "x23_bpe_tokenize" -> x23BpeTokenize)

  val oracle: Map[String, String] = Map.empty
}

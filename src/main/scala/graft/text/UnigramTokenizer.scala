package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X50 — UNIGRAM-LM (SentencePiece-style) tokenization: the OTHER
  * major subword family beside BPE (x22/x23). Where BPE replays a
  * learned merge list greedily, a unigram tokenizer scores every
  * possible segmentation against per-piece log-probabilities and
  * keeps the best — a Viterbi dynamic program per word (Kudo 2018,
  * §3; SentencePiece's inference path). This ships the INFERENCE
  * kernel — the part a 100 TB pipeline runs on every document; a
  * vocabulary fit (EM over the same DP) is driver-local over the
  * bounded vocab like the BPE trainer and out of scope here.
  *
  * Scale shape — identical to x23: one embarrassingly-parallel
  * mapPartitions over documents, zero shuffle before the per-shard
  * rollup, a per-partition word→count memo exploiting Zipf
  * repetition (same cap policy as [[BpeMerges.tokenCounter]]).
  *
  * Gate (the x26b discipline, for the DP): under the pinned
  * [[GateVocab]] — every single char at −3.0, "th" −4.0, "the" −4.5 —
  * the optimum has a CLOSED FORM. "th" occurrences in a word can
  * never overlap (two starts one apart would need s[i+1] = 't' AND
  * 'h'), each saves exactly 2.0 over its chars, each "the" saves 4.5
  * and strictly beats th+e (−4.5 > −7), and the spans are disjoint,
  * so the unique optimum uses "the" for every "the" substring, "th"
  * for every remaining "th", chars elsewhere:
  *   tokens(w) = len(w) − occ(w,"th") − occ(w,"the")
  * — plain replace()/length SQL. That the kernel is a REAL DP and
  * not greedy longest-match is pinned separately in ChunkingSpec
  * with a vocab where greedy and optimal diverge. */
object UnigramTokenizer {

  /** Same per-word cap as the BPE kernel — bounds the DP and the
    * memo on adversarial inputs; mirrored by left(w, 64) in SQL. */
  private[text] val WordLimit = 64

  /** The gate vocabulary (see object scaladoc for the closed form). */
  private[graft] val GateVocab: Map[String, Double] =
    ('a' to 'z').map(c => c.toString -> -3.0).toMap ++
      Map("th" -> -4.0, "the" -> -4.5)

  /** Viterbi segmentation of one word under `vocab` (piece →
    * log-prob). Deterministic tie-break: higher score, then fewer
    * tokens, then the longer final piece at each boundary. Requires
    * every character of `word` to be coverable (the caller's vocab
    * must contain all singles, as SentencePiece's byte/char fallback
    * guarantees in production). */
  def segment(word0: String, vocab: Map[String, Double]): Seq[String] = {
    val word = word0.take(WordLimit)
    val n = word.length
    if (n == 0) return Nil
    val maxLen = vocab.keysIterator.map(_.length).max
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val count = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(i, maxLen)
      while (l <= lMax) {
        if (score(i - l) > Double.NegativeInfinity) {
          vocab.get(word.substring(i - l, i)).foreach { s =>
            val cand = score(i - l) + s
            val candCount = count(i - l) + 1
            val better = cand > score(i) ||
              (cand == score(i) && (candCount < count(i) ||
                (candCount == count(i) && l > back(i))))
            if (better) { score(i) = cand; count(i) = candCount; back(i) = l }
          }
        }
        l += 1
      }
      require(back(i) > 0,
        s"unigram tokenizer: no vocab piece covers position $i of " +
          s"'$word' — the vocabulary must include every character")
      i += 1
    }
    var out = List.empty[String]
    var j = n
    while (j > 0) { out = word.substring(j - back(j), j) :: out; j -= back(j) }
    out
  }

  /** Per-partition memoized word→token-count — the same memo policy
    * as [[BpeMerges.tokenCounter]] so the two families cannot drift. */
  private[text] def tokenCounter(
      vocab: Map[String, Double]): String => Long = {
    val MemoCap = 1 << 20
    val memo = mutable.HashMap.empty[String, Long]
    w =>
      if (memo.size < MemoCap)
        memo.getOrElseUpdate(w, segment(w, vocab).length.toLong)
      else segment(w, vocab).length.toLong
  }

  private val ShardCount = 8

  /** X50 — per-shard unigram token mass over the documents corpus
    * under the pinned gate vocabulary; shard key = the repo's
    * SQL-replayable Knuth mix (overflow-masked, the x18b guard). */
  def x50UnigramTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        (shiftright(pmod(col("doc_id"), lit(2147483648L))
          * 2654435761L, 16) % ShardCount).as("shard"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("words"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val tok = tokenCounter(GateVocab)
        it.map { case (shard, words) =>
          (shard,
            words.map(w => w.take(WordLimit).length.toLong).sum,
            words.map(tok).sum)
        }
      }
      .toDF("shard", "n_chars", "n_tokens")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("bigint").as("sum_char_tokens"),
        sum("n_tokens").cast("bigint").as("sum_unigram_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x50_unigram_tokens" -> x50UnigramTokens)

  val oracle: Map[String, String] = {
    val w = "left(w, 64)"
    val tok = s"length($w) - " +
      s"(length($w) - length(replace($w, 'th', ''))) // 2 - " +
      s"(length($w) - length(replace($w, 'the', ''))) // 3"
    Map("x50_unigram_tokens" ->
      s"""SELECT cast((((doc_id % 2147483648) * 2654435761) >> 16)
             % $ShardCount AS bigint) AS shard,
           cast(count(*) AS bigint) AS n_docs,
           cast(sum(coalesce(list_sum(list_transform(
             regexp_extract_all(lower(text), '[a-z]+'),
             w -> length($w))), 0)) AS bigint) AS sum_char_tokens,
           cast(sum(coalesce(list_sum(list_transform(
             regexp_extract_all(lower(text), '[a-z]+'),
             w -> $tok)), 0)) AS bigint) AS sum_unigram_tokens
         FROM documents GROUP BY 1""")
  }
}

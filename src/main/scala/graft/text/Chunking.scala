package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Segment-grain curation operators: C4-style line gating, sliding
  * context-window chunking, and a cluster-aware leakage-safe split.
  * (The reference has no segment ops — R's unit is the whole row; this
  * is the training-data extension layer, SURVEY §7 phase 4.)
  *
  * Scale shape: x35/x36 are pure per-row expression pipelines — no
  * join, no aggregation across docs, so at 100 TB they run at
  * parquet-scan speed with zero exchanges (ChunkingSpec pins the
  * no-Exchange plan). x39 reuses the d6 cluster labels (capped pair
  * graph + O(log n)-round star contraction) and adds one hash
  * aggregation over three split keys.
  *
  * The corpus has no newlines or punctuation, so "line" here is a
  * fixed [[LineTokens]]-token segment — the same adaptation d8 makes
  * for paragraphs (Dedup.scala); every gate below is the
  * corpus-expressible analog of a C4 rule (Raffel et al. 2020 §2.2).
  */
object Chunking {

  /** Tokens per synthetic "line" (x35). */
  private[graft] val LineTokens = 15

  /** C4 "at least N words" line gate. */
  private[graft] val MinLineTokens = 5

  /** Sliding-window size / stride (x36): 64-token contexts with a
    * 16-token overlap, the shape a fixed-context trainer consumes.
    * Stride < window ⇒ no token is orphaned at a boundary and the
    * final window is never empty. */
  private[graft] val ChunkTokens = 64
  private[graft] val ChunkStride = 48

  /** Same prose-evidence list as TextAnalysis.stopEn — a line with no
    * stopword is the no-terminal-punctuation analog. */
  private[graft] val LineStop =
    Seq("the", "a", "and", "of", "to", "in", "is", "on")

  private val sp = split(col("text"), " ")

  /** X35 — C4-style line-gate cleaning (Raffel et al. 2020 §2.2,
    * adapted): explode each doc into fixed 15-token lines and keep a
    * line iff
    *   (1) it has ≥ [[MinLineTokens]] tokens (the "≥ 3 words" rule —
    *       drops ragged final segments),
    *   (2) it contains a stopword (the "terminal punctuation /
    *       looks-like-prose" rule — this corpus has no punctuation),
    *   (3) 2·distinct(tokens) ≥ tokens (boilerplate/repetition gate,
    *       integer form so both engines compare exactly).
    * Emits per doc the line counts, surviving token mass, and the
    * md5 of the re-joined cleaned text (the content a cleaned-corpus
    * writer would persist). "Explode" is entirely intra-row — nested
    * higher-order functions over one split, so the op is a
    * zero-shuffle scan; nothing leaves the row until the final
    * projection. */
  def x35LineGates(s: SparkSession, dir: String): DataFrame =
    lineGatesOf(Tables.documents(s, dir))

  /** The x35 body over any (doc_id, text) frame — planted-fixture
    * entry for ChunkingSpec. */
  private[graft] def lineGatesOf(docs: DataFrame): DataFrame = {
    val nLines = ceil(size(sp) / lit(LineTokens.toDouble)).cast("int")
    val lines = transform(sequence(lit(0), nLines - 1),
      i => slice(sp, i * LineTokens + 1, lit(LineTokens)))
    val kept = filter(lines, l =>
      size(l) >= MinLineTokens &&
        exists(l, t => t.isin(LineStop: _*)) &&
        size(array_distinct(l)) * 2 >= size(l))
    docs.select(
      col("doc_id"),
      nLines.cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      aggregate(kept, lit(0L), (acc, l) => acc + size(l))
        .as("n_kept_tokens"),
      md5(array_join(flatten(kept), " ")).as("clean_md5"))
  }

  /** X36 — sliding context windows: cut each doc's token sequence
    * into 64-token chunks on a 48-token stride (16-token overlap), the
    * fixed-context pre-tokenization shape (GPT-style training examples
    * or RAG passage chunks). One chunk row per window with its token
    * count and content hash. The generator runs per-row (posexplode
    * of an intra-row transform) — zero shuffle, output ~n/stride rows
    * per doc; window count = 1 + ceil(max(n−64,0)/48) covers every
    * token and, because stride < window, never emits an empty chunk. */
  def x36ChunkWindows(s: SparkSession, dir: String): DataFrame =
    chunkWindowsOf(Tables.documents(s, dir))

  /** The x36 body over any (doc_id, text) frame. */
  private[graft] def chunkWindowsOf(docs: DataFrame): DataFrame = {
    val nWin = (ceil(greatest(size(sp) - ChunkTokens, lit(0)) /
      lit(ChunkStride.toDouble)) + 1).cast("int")
    docs
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), nWin - 1),
        i => array_join(slice(sp, i * ChunkStride + 1, lit(ChunkTokens)), " ")))
        .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        size(split(col("chunk"), " ")).cast("long").as("n_tok"),
        md5(col("chunk")).as("chunk_md5"))
  }

  /** The split mix: the o3/x14/x17 multiplicative high-bits mix of the
    * CLUSTER representative, mod 10 → 0–7 train / 8 val / 9 test. */
  private def splitOf(rep: Column): Column = {
    val m = shiftright(rep * 2654435761L, 16) % 10
    when(m < 8, "train").when(m === 8, "val").otherwise("test")
  }

  /** X39 — leakage-safe train/val/test split: assign each document to
    * a split by the hash of its d6 near-dup CLUSTER representative,
    * not its own id — so a near-duplicate of a training document can
    * never land in val/test (the train-test contamination mode that
    * doc-level random splits suffer; cf. x13's string-match
    * decontamination, which this makes unnecessary WITHIN a corpus).
    * 80/10/10 by the same key-mix arithmetic as x17's shards, applied
    * to the rep. Emits per-split doc counts, cluster counts and token
    * mass. ChunkingSpec asserts the leakage property itself: no d2b
    * pair crosses splits. Cost beyond d6's labels: one scan-level
    * doc_id-keyed join plus a 3-key hash agg. */
  def x39LeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    val labels = Dedup.d6DedupClusters(s, dir)
    Tables.documents(s, dir)
      .select(col("doc_id"), size(sp).cast("long").as("n_tok"))
      .join(labels, "doc_id")
      .withColumn("split", splitOf(col("rep")))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_clusters"),
        sum(col("n_tok")).as("sum_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x35_line_gates" -> x35LineGates,
    "x36_chunk_windows" -> x36ChunkWindows,
    "x39_leakage_safe_split" -> x39LeakageSafeSplit)

  val oracle: Map[String, String] = Map(
    "x35_line_gates" ->
      s"""WITH sp AS (SELECT doc_id, string_split(text, ' ') AS s
                      FROM documents),
         l AS (SELECT doc_id,
                 cast(ceil(len(s) / $LineTokens.0) AS int) AS n_lines,
                 list_transform(
                   range(0, cast(ceil(len(s) / $LineTokens.0) AS int)),
                   i -> s[i*$LineTokens+1 : i*$LineTokens+$LineTokens])
                   AS lines
               FROM sp),
         k AS (SELECT doc_id, n_lines,
                 list_filter(lines, x ->
                   len(x) >= $MinLineTokens
                   AND list_has_any(x,
                     [${LineStop.map(w => s"'$w'").mkString(", ")}])
                   AND 2 * len(list_distinct(x)) >= len(x)) AS kept
               FROM l)
         SELECT doc_id,
           cast(n_lines AS bigint) AS n_lines,
           cast(len(kept) AS bigint) AS n_kept,
           cast(coalesce(list_sum(list_transform(kept, x -> len(x))), 0)
             AS bigint) AS n_kept_tokens,
           md5(coalesce(array_to_string(flatten(kept), ' '), ''))
             AS clean_md5
         FROM k""",
    "x36_chunk_windows" ->
      s"""WITH sp AS (SELECT doc_id, string_split(text, ' ') AS s
                      FROM documents),
         w AS (SELECT doc_id, s,
                 unnest(range(0,
                   cast(ceil(greatest(len(s) - $ChunkTokens, 0)
                     / $ChunkStride.0) AS int) + 1)) AS i
               FROM sp)
         SELECT doc_id, cast(i AS bigint) AS chunk_idx,
           cast(len(s[i*$ChunkStride+1 : i*$ChunkStride+$ChunkTokens])
             AS bigint) AS n_tok,
           md5(array_to_string(
             s[i*$ChunkStride+1 : i*$ChunkStride+$ChunkTokens], ' '))
             AS chunk_md5
         FROM w""",
    "x39_leakage_safe_split" ->
      s"""WITH RECURSIVE ${Dedup.d6LabelCtes},
         t AS (SELECT l.doc_id, l.rep,
                 len(string_split(d.text, ' ')) AS n_tok,
                 (l.rep * 2654435761 >> 16) % 10 AS m
               FROM labels l JOIN documents d ON d.doc_id = l.doc_id)
         SELECT CASE WHEN m < 8 THEN 'train'
                     WHEN m = 8 THEN 'val'
                     ELSE 'test' END AS split,
           cast(count(*) AS bigint) AS n_docs,
           cast(count(DISTINCT rep) AS bigint) AS n_clusters,
           cast(sum(n_tok) AS bigint) AS sum_tokens
         FROM t GROUP BY 1""")
}

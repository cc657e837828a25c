package graft.text

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** X8 — sequence packing: assemble tokenized documents into
  * fixed-token-budget training sequences, the step between a curated
  * corpus (x6) and a training run. Unpacked short documents waste the
  * context window as padding; packing fills each `maxTokens` sequence
  * with whole documents (Raffel et al. 2020 §2.2 pack examples this
  * way for T5; Brown et al. 2020 likewise).
  *
  * Bin packing is inherently sequential, so the scalable form is
  * partition-local next-fit: documents are range-partitioned and
  * sorted by doc_id (deterministic layout), each partition packs ITS
  * OWN docs in order, and sequence ids carry the partition id in the
  * high bits so bins never span partitions — no shuffle beyond the
  * range partitioning, no coordination. The price is at most one
  * underfull trailing bin per partition: waste ≤ numPartitions ·
  * maxTokens tokens total, negligible against total_tokens/maxTokens
  * bins at corpus scale (and the spec pins exactly this bound).
  * A document longer than the budget gets a bin of its own, flagged
  * `oversize` — chunk-or-drop is the caller's policy decision.
  */
object SequencePacking {

  /** Pack (doc_id, n_tokens) rows into sequences of at most
    * `maxTokens`. Output: one row per doc — (doc_id, n_tokens,
    * seq_id, oversize). */
  def packSequences(docsWithTokens: DataFrame, maxTokens: Int,
      numParts: Int): DataFrame = {
    val s = docsWithTokens.sparkSession
    import s.implicits._
    docsWithTokens
      .repartitionByRange(numParts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .select(col("doc_id").cast("long"), col("n_tokens").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        var nextBin = 1L // bin 0 is the initial running bin
        var curBin = 0L
        var fill = 0L
        it.map { case (id, t) =>
          val oversize = t > maxTokens
          if (oversize) {
            // a bin of its own; curBin/fill untouched, so the running
            // bin GENUINELY continues across interspersed oversize
            // docs — the ≤-one-underfull-trailing-bin waste bound
            // depends on never abandoning a partial bin
            val b = nextBin
            nextBin += 1
            (id, t, (pid << 32) | b, true)
          } else {
            if (fill + t > maxTokens) {
              curBin = nextBin; nextBin += 1; fill = 0L
            }
            fill += t
            (id, t, (pid << 32) | curBin, false)
          }
        }
      }.toDF("doc_id", "n_tokens", "seq_id", "oversize")
  }

  /** The queries() surface: pack the documents table at a 512-token
    * budget using the whitespace token count (x1's `token_count`
    * native expression). Rows-only — next-fit is a reset-based
    * recurrence over ordered rows, not expressible as window SQL;
    * PackingSpec pins the invariants (budget respected, every doc
    * exactly once, waste bound). */
  def x8SequencePacking(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      expr("token_count(text)").cast("long").as("n_tokens"))
    packSequences(docs, maxTokens = 512, numParts = 8)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x8_sequence_packing" -> x8SequencePacking)

  val oracle: Map[String, String] = Map.empty
}

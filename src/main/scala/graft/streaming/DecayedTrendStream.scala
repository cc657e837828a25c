package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.SnapshotStore

/** Streaming twin of [[EventStreams.e6DecayedTrend]]'s decay fold —
  * trending tokens maintained incrementally: per micro-batch,
  *   state ← state · λ + batch_counts          (λ = ½)
  * which unrolls to exactly e6's Σ c_b · λ^(B−b) with day = batch
  * index. The recurrence is the whole point: a 100 TB history never
  * re-aggregates — each batch pays O(its own counts) plus a ≤ k-row
  * state rewrite.
  *
  * State is bounded at k rows the [[HeavyHitterStream]] way, but the
  * cap is DECAY-AWARE: after the fold, keep the top k by decayed
  * weight (weight desc, token asc — deterministic). Per-batch input
  * is likewise truncated to its top k raw counts before the fold; a
  * dropped token's contribution is bounded by the batch's k-th count
  * decaying from the moment it was dropped — the standard trending
  * truncation, documented rather than hidden. Within a token domain
  * under k (the spec's regime and the e6 event-type domain) no
  * truncation ever fires and the fold is EXACT.
  *
  * Exactly-once: the applied-batch watermark (MvStream's trick) —
  * the decay fold is non-idempotent twice over (a replay would decay
  * AND re-add), so a replayed micro-batch must be a metadata-only
  * skip; the state table is a [[SnapshotStore]] so readers see
  * consistent versions and the trend history time-travels. All
  * arithmetic is exact powers of two times integer counts (the e6
  * determinism argument), so batch-vs-stream parity is bit-equality,
  * not tolerance. */
object DecayedTrendStream {

  val Lambda = 0.5

  private def appliedBatch(s: SparkSession, root: String): Long =
    if (SnapshotStore.snapshots(s, root).isEmpty) -1L
    else SnapshotStore.read(s, root)
      .agg(max(col("applied_batch"))).head() match {
        case r if r.isNullAt(0) => -1L
        case r => r.getLong(0)
      }

  /** Fold one batch of `token` rows into the decayed state. Public
    * so the spec can drive the closed-form parity directly. */
  private[graft] def foldBatch(s: SparkSession, batch: DataFrame,
      batchId: Long, root: String, k: Int): Unit = {
    import s.implicits._
    if (batchId <= appliedBatch(s, root)) return // replay: skip
    val bCounts: Map[String, Long] = batch
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
      .as[(String, Long)].collect().toMap
    val prior: Map[String, Double] =
      if (SnapshotStore.snapshots(s, root).isEmpty) Map.empty
      else SnapshotStore.read(s, root)
        .select("token", "decayed").as[(String, Double)]
        .collect().toMap
    val folded = (prior.keySet ++ bCounts.keySet).iterator.map { t =>
      t -> (prior.getOrElse(t, 0.0) * Lambda +
        bCounts.getOrElse(t, 0L).toDouble)
    }.toSeq
    val kept = folded.sortBy { case (t, w) => (-w, t) }.take(k)
    if (kept.nonEmpty) {
      SnapshotStore.commit(
        kept.toDF("token", "decayed")
          .withColumn("applied_batch", lit(batchId)),
        root)
    }
  }

  /** Start maintaining the trend state from a streaming `token`
    * feed. */
  def start(tokens: DataFrame, root: String, checkpointDir: String,
      k: Int = 64): StreamingQuery =
    tokens.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        foldBatch(b.sparkSession, b.toDF(), id, root, k)
      }
      .start()
}

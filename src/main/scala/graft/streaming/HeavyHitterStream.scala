package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.Tables
import graft.functions.HeavyHitters
import graft.sources.SnapshotStore

/** Streaming heavy hitters — the x9 Misra–Gries summary maintained
  * incrementally over an unbounded token stream with STATE BOUNDED
  * AT k COUNTERS, which is the whole point of the sketch: an exact
  * streaming top-k needs per-token state (unbounded vocabulary), MG
  * holds k rows forever and the n/(k+1) lower-bound envelope
  * survives every merge (mergeable summaries, Agarwal et al. 2012).
  *
  * Per micro-batch: one typed-Aggregator pass summarizes the batch
  * (partition-local MG buffers, merged by the same
  * subtract-the-(k+1)th construction), the ≤ k-entry batch summary
  * folds into the ≤ k-entry state at the driver — bounded by
  * construction — and the new state commits to a snapshot-store
  * table carrying an `applied_batch` watermark (the MvStream trick):
  * a replayed micro-batch sees its id already applied and no-ops,
  * making the NON-idempotent fold exactly-once, and the summary's
  * history stays time-travelable (what were the top tokens as of
  * batch 7?). */
object HeavyHitterStream {

  private def appliedBatch(s: SparkSession, root: String): Long =
    if (SnapshotStore.snapshots(s, root).isEmpty) -1L
    else SnapshotStore.read(s, root)
      .agg(max(col("applied_batch"))).head() match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }

  /** Fold one batch of documents into the state table. Public for
    * the spec to drive multi-batch merges directly. */
  private[graft] def applyBatch(s: SparkSession, batch: DataFrame,
      batchId: Long, root: String, k: Int): Unit = {
    import s.implicits._
    val last = appliedBatch(s, root)
    if (batchId <= last) return // replayed delivery — already folded
    val bMap = batch
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(HeavyHitters.heavyHitters(k)(col("token")).as("hh"))
      .head().getAs[Map[String, Long]](0)
    val prior: Map[String, Long] =
      if (last < 0) Map.empty
      else SnapshotStore.read(s, root)
        .select("token", "count_lb").as[(String, Long)]
        .collect().toMap
    val merged = HeavyHitters.mergeMaps(prior, bMap, k)
    if (merged.nonEmpty) {
      SnapshotStore.commit(
        merged.toSeq.toDF("token", "count_lb")
          .withColumn("applied_batch", lit(batchId)),
        root)
    }
  }

  def start(s: SparkSession, dir: String, stateRoot: String,
      checkpointDir: String, k: Int = 64): StreamingQuery =
    Tables.documentsStream(s, dir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        applyBatch(s, batch.toDF(), id, stateRoot, k)
      }
      .start()
}

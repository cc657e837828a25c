package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.KmvSketch
import graft.sources.SnapshotStore

/** Streaming audience-overlap state — the x52 KMV sketch maintained
  * incrementally over an unbounded event stream, completing the
  * per-sketch streaming-fold family ([[HeavyHitterStream]] folds MG,
  * [[DecayedTrendStream]] folds the decay recurrence; this folds
  * bottom-k). Per micro-batch: ONE bounded-buffer aggregation
  * summarizes the batch into ≤ k hashes per event type, and the
  * state fold is bottom-k-of-union per type — after any number of
  * batches the state IS the sketch of the full history (bottom-k of
  * a union equals bottom-k of unioned bottom-k's), so every pairwise
  * overlap estimate [[KmvSketch.overlapEst]] serves straight off the
  * |types|-row state (≤ k hashes per row) with zero history
  * re-aggregation.
  *
  * Replay safety is DOUBLE here, and the distinction is the point:
  * the fold is mathematically IDEMPOTENT (re-unioning a batch's
  * hashes changes nothing — unlike MG's additive counts or the decay
  * recurrence), so even a lost watermark could not corrupt the
  * state; the applied-batch watermark is kept anyway to make a
  * replay METADATA-ONLY (skip the aggregation and the state rewrite,
  * not just the damage) and to keep the state time-travelable like
  * its sibling folds. */
object KmvStream {

  private def appliedBatch(s: SparkSession, root: String): Long =
    if (SnapshotStore.snapshots(s, root).isEmpty) -1L
    else SnapshotStore.read(s, root)
      .agg(max(col("applied_batch"))).head() match {
        case r if r.isNullAt(0) => -1L
        case r => r.getLong(0)
      }

  /** Fold one batch of (event_type, user_id) rows into the per-type
    * sketch state. Public so the spec can drive the union algebra
    * directly. */
  private[graft] def foldBatch(s: SparkSession, batch: DataFrame,
      batchId: Long, root: String, k: Int): Unit = {
    import s.implicits._
    if (batchId <= appliedBatch(s, root)) return // replay: skip
    val bSketches: Map[String, Seq[Long]] = batch
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        pmod(xxhash64(col("user_id")),
          lit(KmvSketch.HashDomain)).as("h"))
      .groupBy("event_type")
      .agg(KmvSketch.kmv(k)(col("h")).as("sk"))
      .as[(String, Seq[Long])].collect().toMap
    val prior: Map[String, Seq[Long]] =
      if (SnapshotStore.snapshots(s, root).isEmpty) Map.empty
      else SnapshotStore.read(s, root)
        .select("event_type", "sk").as[(String, Seq[Long])]
        .collect().toMap
    val folded = (prior.keySet ++ bSketches.keySet).toSeq.sorted
      .map { t =>
        (t, KmvSketch.unionSketch(
          prior.getOrElse(t, Seq.empty),
          bSketches.getOrElse(t, Seq.empty), k))
      }
    if (folded.nonEmpty) {
      SnapshotStore.commit(
        folded.toDF("event_type", "sk")
          .withColumn("applied_batch", lit(batchId)),
        root)
    }
  }

  /** Pairwise overlap estimates served off the standing state — the
    * x52 read-out with no event scan. */
  def overlaps(s: SparkSession, root: String, k: Int): DataFrame = {
    import s.implicits._
    val sketches = SnapshotStore.read(s, root)
      .select("event_type", "sk").as[(String, Seq[Long])]
      .collect().sortBy(_._1)
    (for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
    } yield {
      val (ta, sa) = sketches(i)
      val (tb, sb) = sketches(j)
      val (dU, dI) = KmvSketch.overlapEst(sa, sb, k)
      (ta, tb, KmvSketch.distinctEst(sa, k),
        KmvSketch.distinctEst(sb, k), dU, dI)
    }).toSeq.toDF("type_a", "type_b", "d_a", "d_b",
      "d_union", "d_intersect")
  }

  /** Start maintaining the sketch state from a streaming
    * (event_type, user_id) feed. */
  def start(events: DataFrame, root: String, checkpointDir: String,
      k: Int = KmvSketch.K): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        foldBatch(b.sparkSession, b.toDF(), id, root, k)
      }
      .start()
}

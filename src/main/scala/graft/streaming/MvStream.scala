package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.SnapshotStore

/** Streaming incremental view maintenance — the streaming twin of
  * [[SnapshotStore.applyCdfDelta]] (SURVEY §2.10 north-star; no
  * reference counterpart): a CDF change feed (insert / delete /
  * update_preimage / update_postimage rows, e.g.
  * [[SnapshotStore.cdfChanges]] between successive table commits)
  * arrives as a stream, and each micro-batch FOLDS into a maintained
  * grouped count+sum view. History is never re-aggregated: per batch
  * the work is one aggregation of the batch's churn plus one keyed
  * merge into the state.
  *
  * The state itself is a [[SnapshotStore]] table, which buys three
  * properties at once:
  *  - readers always see a CONSISTENT view version (the manifest
  *    rename is the visibility point), never a half-merged state;
  *  - exactly-once under foreachBatch replay: the applied batch id
  *    rides IN the committed state (`applied_batch` column), so a
  *    replayed micro-batch (same id, same data — the Structured
  *    Streaming recovery contract) is detected and skipped instead
  *    of double-applied — the idempotence trick of
  *    [[IdempotentSink]] adapted to a NON-idempotent fold;
  *  - view history is time-travelable (audit "the dashboard as of
  *    batch 17") and reapable via [[SnapshotStore.vacuum]].
  *
  * Scale: per micro-batch cost is O(churn) + O(touched state
  * groups); the state table rewrite is the one full-state write per
  * batch — at a 10⁸-group state that write dominates and the
  * production refinement is partitioning the state on the group key
  * and rewriting only touched partitions ([[graft.sources.MergeInto
  * .mergeIntoPartitioned]] composes here), which this API permits by
  * construction since the fold is already keyed. */
object MvStream {

  /** Highest batch id folded into the committed state (−1 if none).
    * `applied_batch` is identical on every state row by construction
    * (stamped per commit), so ONE row answers it — a limit-1
    * columnar read, not an O(state) aggregate scan. */
  def appliedBatch(s: SparkSession, root: String): Long =
    if (SnapshotStore.snapshots(s, root).isEmpty) -1L
    else SnapshotStore.read(s, root)
      .select(col("applied_batch")).limit(1)
      .collect().headOption match {
        case Some(r) if !r.isNullAt(0) => r.getLong(0)
        case _ => -1L // empty state (all groups gone)
      }

  /** Fold one CDF micro-batch into the maintained view. Public and
    * deterministic in (batch, batchId) so tests drive the replay
    * contract directly. The decimal sum is pinned to decimal(30,2)
    * so the state schema is stable across arbitrarily many folds
    * (the merge's add widens by one digit per application). */
  def foldBatch(batch: Dataset[Row], batchId: Long, root: String,
      groupCol: String, sumCol: String): Unit = {
    val s = batch.sparkSession
    if (batchId <= appliedBatch(s, root)) return // replay: already folded
    val prior =
      if (SnapshotStore.snapshots(s, root).isEmpty) None
      else Some(SnapshotStore.read(s, root))
    val state0 = prior.map(_.drop("applied_batch")).getOrElse(
      SnapshotStore.aggState(batch.filter(lit(false)), groupCol, sumCol))
    val state1 = SnapshotStore
      .applyCdfDelta(state0, batch, groupCol, sumCol)
      .select(col(groupCol), col("n_rows"),
        col("s_dec").cast("decimal(30,2)").as("s_dec"))
      .withColumn("applied_batch", lit(batchId))
    SnapshotStore.commit(state1, root)
  }

  /** Start maintaining the view from a streaming CDF feed. */
  def start(changes: DataFrame, root: String, checkpointDir: String,
      groupCol: String, sumCol: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) =>
        foldBatch(b, id, root, groupCol, sumCol))
      .start()

  /** The current maintained view (sum surfaced as double). */
  def readView(s: SparkSession, root: String): DataFrame = {
    val st = SnapshotStore.read(s, root)
    val group = st.columns
      .filterNot(Set("n_rows", "s_dec", "applied_batch")).head
    st.select(col(group), col("n_rows"),
      col("s_dec").cast("double").as("sum_val"))
  }
}

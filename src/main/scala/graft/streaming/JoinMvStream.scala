package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.SnapshotStore

/** Streaming maintenance of a PK-FK JOIN view — the streaming twin of
  * [[SnapshotStore.applyJoinDelta]] the way [[MvStream]] twins the
  * signed-agg fold. One change feed carries BOTH sides' churn, each
  * row tagged `side` ('fact' or 'dim') with the other side's columns
  * null; per micro-batch the feed splits into ΔA/ΔB, the serving
  * layer's DIM MIRROR (a second, small snapshot table — the standing
  * copy of the dimension the view is denormalized against) is
  * patched first, and the view folds through `applyJoinDelta`
  * against the POST-patch mirror, so the in-batch ΔA⋈ΔB cross term
  * lands with the dim's newest attributes.
  *
  * Idempotence is STRUCTURAL here, unlike MvStream's signed fold: a
  * join-view patch writes absolute postimage values (a dim update
  * sets the segment, it doesn't add to it; a fact replace re-derives
  * the whole row), so replaying a batch reproduces the same state
  * bit-for-bit even without the guard. The `applied_batch` column is
  * kept anyway — it makes replay a metadata-only skip instead of a
  * re-fold, and it timestamps every view snapshot for audit.
  *
  * Feed contract: causally ordered CDC (a dim row arrives no later
  * than the first fact referencing it — the prefix-FK-validity every
  * transactional CDC feed provides). A fact whose dim key is missing
  * at fold time leaves the view (inner-join semantics) and is NOT
  * resurrected by the dim's later arrival; buffering unmatched facts
  * until their dim arrives is the Sessionize buffered-state pattern,
  * deliberately not paid here.
  *
  * Scale: per batch O(churn + view fan-out of churned FKs) plus the
  * state-table write; the mirror is dim-sized (small by star-schema
  * construction), and the view write partitions/bucketizes on the FK
  * exactly like MvStream's production refinement. Cold start needs
  * no special path: the initial load is one big all-inserts batch
  * (patched = ∅, refreshed = A⋈B — the view materializes itself). */
object JoinMvStream {

  /** Highest batch id folded into the committed view (−1 if none).
    * `applied_batch` is identical on every view row by construction,
    * so ONE row answers it — a limit-1 columnar read of one parquet
    * file, not an O(view) aggregate scan. (A production store would
    * pin the watermark in the manifest itself; reading one cell keeps
    * the manifest format engine-portable.) */
  def appliedBatch(s: SparkSession, root: String): Long =
    if (SnapshotStore.snapshots(s, root).isEmpty) -1L
    else SnapshotStore.read(s, root)
      .select(col("applied_batch")).limit(1)
      .collect().headOption match {
        case Some(r) if !r.isNullAt(0) => r.getLong(0)
        case _ => -1L // empty state (all rows gone)
      }

  /** Fold one tagged change micro-batch into the maintained view and
    * dim mirror. Public and deterministic in (batch, batchId) so
    * tests drive the replay contract directly. */
  def foldBatch(batch: Dataset[Row], batchId: Long, viewRoot: String,
      dimRoot: String): Unit = {
    val s = batch.sparkSession
    if (batchId <= appliedBatch(s, viewRoot)) return // replay: skip
    val dA = batch.filter(col("side") === "fact")
      .select(col("change_type"), col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"))
    val dB = batch.filter(col("side") === "dim")
      .select(col("change_type"), col("c_custkey"), col("c_mktsegment"))
    // dim mirror: keyed upsert — absolute values, idempotent
    val dim0 =
      if (SnapshotStore.snapshots(s, dimRoot).isEmpty)
        dB.filter(lit(false)).select("c_custkey", "c_mktsegment")
      else SnapshotStore.read(s, dimRoot)
    val dim1 = dim0
      .join(dB.select(col("c_custkey")), Seq("c_custkey"), "left_anti")
      .unionByName(dB.filter(col("change_type") =!= "delete")
        .select("c_custkey", "c_mktsegment"))
      .localCheckpoint(true)
    val view0 =
      if (SnapshotStore.snapshots(s, viewRoot).isEmpty)
        dA.filter(lit(false))
          .crossJoin(dB.filter(lit(false)).select("c_mktsegment"))
          .select("o_orderkey", "o_custkey", "o_totalprice",
            "c_mktsegment")
      else SnapshotStore.read(s, viewRoot).drop("applied_batch")
    val view1 = SnapshotStore.applyJoinDelta(view0, dA, dB, dim1)
      .withColumn("applied_batch", lit(batchId))
    // mirror first, view last: the view's applied_batch is the
    // recovery watermark, so a crash between the two commits replays
    // the batch — the dim upsert re-applies idempotently
    SnapshotStore.commit(dim1, dimRoot)
    SnapshotStore.commit(view1, viewRoot)
  }

  /** Start maintaining the view from a streaming tagged change feed. */
  def start(changes: DataFrame, viewRoot: String, dimRoot: String,
      checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) =>
        foldBatch(b, id, viewRoot, dimRoot))
      .start()

  /** The current maintained view. */
  def readView(s: SparkSession, root: String): DataFrame =
    SnapshotStore.read(s, root).drop("applied_batch")

  /** Tag helper: lift a fact-side / dim-side change frame into the
    * unified feed schema (other side's columns null). */
  def tagFact(dA: DataFrame): DataFrame =
    dA.select(lit("fact").as("side"), col("change_type"),
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
      lit(null).cast("long").as("c_custkey"),
      lit(null).cast("string").as("c_mktsegment"))

  def tagDim(dB: DataFrame): DataFrame =
    dB.select(lit("dim").as("side"), col("change_type"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("long").as("o_custkey"),
      lit(null).cast("double").as("o_totalprice"),
      col("c_custkey"), col("c_mktsegment"))
}

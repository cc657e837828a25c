package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once file sink via `foreachBatch` + batch-id-keyed
  * overwrite (SURVEY §2.10 north-star; no reference counterpart).
  *
  * Structured Streaming's replay contract is: after a failure, the
  * checkpoint re-invokes `foreachBatch` with the SAME `batchId` and
  * the same data. The sink turns that at-least-once invocation into
  * exactly-once OUTPUT by making the write a deterministic, idempotent
  * function of the batch id — each micro-batch lands in its own
  * `batch_id=<id>/` hive partition with `overwrite` mode, so a replay
  * overwrites its own previous (possibly partial) attempt instead of
  * appending duplicates. This is the standard public recipe for
  * transactional-ish sinks on stores without atomic multi-file commit.
  *
  * Scale: the write itself is a plain distributed parquet write (one
  * task per partition of the micro-batch); nothing funnels through the
  * driver. Readers get partition pruning on `batch_id` for free via
  * hive-style discovery.
  */
object IdempotentSink {

  /** The per-batch writer — public and deterministic in (data, id) so
    * tests can invoke a "replay" directly. */
  def writeBatch(batch: Dataset[Row], batchId: Long, outDir: String): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Start the stream with a checkpoint; replays after restart are
    * deduplicated by the batch-id-keyed overwrite above. */
  def start(stream: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) => writeBatch(b, id, outDir))
      .start()

  /** Read everything the sink has committed; `batch_id` surfaces as a
    * partition column. */
  def readOutput(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
}

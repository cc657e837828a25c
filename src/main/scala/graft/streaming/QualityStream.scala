package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.Tables
import graft.functions.GraftFunctions
import graft.text.TextAnalysis

/** Streaming quality gate — x14's mixture filter and x15's
  * repetition profile as a continuous ingest job:
  *
  *   documents stream → key-derived mixture membership (a pure
  *   filter) → repetition/lexical-diversity metrics (codegen'd
  *   `distinct_ngram_count` kernels) → exactly-once
  *   [[IdempotentSink]].
  *
  * Every stage is STATELESS — per-row arithmetic and per-row
  * expressions with no aggregation — so the stream needs no
  * watermark, holds zero state, and the streamed output is
  * row-for-row the batch result regardless of how the corpus is
  * split into micro-batches (StreamingSpec pins one-batch parity;
  * statelessness makes the multi-batch case the same claim). This is
  * the ingest-side half of quality curation: score-and-sample at
  * arrival, corpus-level passes (x12's NLL needs global vocab
  * counts, x13's contamination needs the benchmark index) stay
  * batch-side or join a broadcast static index like
  * [[NearDupStream]] does.
  */
object QualityStream {

  def start(s: SparkSession, dir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    GraftFunctions.register(s)
    val profiled = TextAnalysis.repetitionProfile(
      TextAnalysis.mixtureFilter(Tables.documentsStream(s, dir)))
    profiled.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        IdempotentSink.writeBatch(batch, id, outDir)
      }
      .start()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dedup.Dedup
import graft.ml.{KnnImpute, MiceImpute, Models}
import graft.multimodal.Multimodal
import graft.ops.{Aggregates, BloomJoin, Expectations, Joins,
  KmvSketch, Ordering, PageRank, Relational, Reshape, SkewJoin,
  Sketches, SqlSurface, TemporalJoins}
import graft.plans.TopK
import graft.sim.{HybridRetrieval, MmrRerank, Similarity}
import graft.sources.{BloomSkip, Bucketing, CsvIO, EncodingSniff,
  MergeInto, PartitionPruning, PlotSink, SnapshotStore, ZOrder}
import graft.pipeline.CurationPipeline
import graft.streaming.EventStreams
import graft.text.{BpeMerges, Chunking, QualityClassifier,
  SequencePacking, TextAnalysis, UnigramTokenizer}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory of SURVEY.md §2, one named
  * query per op, each over `/root/testdata/sf*` parquet; `oracleSql`
  * holds the equivalent DuckDB SQL the driver hash-compares against.
  * Non-SQL-expressible ops (spark.ml layer, LSH internals, streaming)
  * appear in `queries` only (rows-only check) and are ScalaTest'd.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * G1, the TPC-H-Q1-shaped groupBy-sum (SURVEY §7 phase 1). */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.g1AggSum(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Aggregates.queries ++ Joins.queries ++
      TemporalJoins.queries ++
      Reshape.queries ++ Ordering.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ EventStreams.queries ++
      Models.queries ++ Multimodal.queries ++ SqlSurface.queries ++
      TopK.queries ++ ZOrder.queries ++ BloomJoin.queries ++
      SkewJoin.queries ++ SequencePacking.queries ++ MergeInto.queries ++
      Bucketing.queries ++ SnapshotStore.queries ++ Sketches.queries ++
      Expectations.queries ++ PartitionPruning.queries ++
      BpeMerges.queries ++ BloomSkip.queries ++
      QualityClassifier.queries ++ PageRank.queries ++
      CurationPipeline.queries ++ Chunking.queries ++
      HybridRetrieval.queries ++ KnnImpute.queries ++ MmrRerank.queries ++
      MiceImpute.queries ++ CsvIO.queries ++ PlotSink.queries ++
      EncodingSniff.queries ++ UnigramTokenizer.queries ++
      KmvSketch.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Aggregates.oracle ++ Joins.oracle ++
      TemporalJoins.oracle ++
      Reshape.oracle ++ Ordering.oracle ++ TextAnalysis.oracle ++
      Dedup.oracle ++ Similarity.oracle ++ EventStreams.oracle ++
      Models.oracle ++ Multimodal.oracle ++ SqlSurface.oracle ++
      TopK.oracle ++ ZOrder.oracle ++ BloomJoin.oracle ++
      SkewJoin.oracle ++ SequencePacking.oracle ++ MergeInto.oracle ++
      Bucketing.oracle ++ SnapshotStore.oracle ++ Sketches.oracle ++
      Expectations.oracle ++ PartitionPruning.oracle ++
      BpeMerges.oracle ++ BloomSkip.oracle ++
      QualityClassifier.oracle ++ PageRank.oracle ++
      CurationPipeline.oracle ++ Chunking.oracle ++
      HybridRetrieval.oracle ++ KnnImpute.oracle ++ MmrRerank.oracle ++
      MiceImpute.oracle ++ CsvIO.oracle ++ PlotSink.oracle ++
      EncodingSniff.oracle ++ UnigramTokenizer.oracle ++
      KmvSketch.oracle
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.types.StructType
import graft.Tables
import graft.ops.Det

/** S3/S4 — file sources and sinks (SURVEY §2.1).
  *
  * S3: header'd UTF-8 CSV write/read (R:1005–1016 `write.csv` /
  * R:89–94 `read.csv`) — schema is always DECLARED on read; inference
  * is both nondeterministic under dirty data and a second full scan.
  * S4: parquet round-trip is the native binary format
  * (R:1018–1027 `saveRDS`/`readRDS`).
  */
object CsvIO {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", true).option("encoding", "UTF-8")
      .csv(path)

  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.option("header", true).option("encoding", "UTF-8")
      .schema(schema).csv(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** JSONL (one JSON object per line) — the dominant interchange
    * format for document corpora. Schema is DECLARED, same rationale
    * as CSV: inference costs a full extra pass and silently unifies
    * dirty rows to string. Lines that fail to parse land in the
    * `_corrupt_record` column when it is present in the schema
    * (PERMISSIVE mode) instead of killing a 100 TB job. */
  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Swap a freshly-written `tmp` directory into place at `path` so
    * that SOME directory holds the data at every instant: the old
    * copy is renamed ASIDE (`path + "_old"`) rather than deleted
    * first — a crash between steps leaves the data discoverable under
    * `_old` (and the new copy under `tmp`), never a window where the
    * dataset path's only copy is gone. On HDFS-like stores each
    * rename is an atomic metadata op; the final `_old` delete is the
    * only destructive step and runs after the new copy is live.
    * Recovery rule after a crash: `_old` present + `path` present →
    * delete `_old`; `_old` present + `path` absent → rename back.
    * The rule is APPLIED here, not just documented: `_old` is only
    * stale (deletable) when `path` exists; if `path` is absent, a
    * prior swap crashed between its two renames and `_old` holds the
    * ONLY committed copy — it is renamed back to `path` first, so the
    * new `tmp` then swaps against a restored dataset instead of
    * silently destroying the rollback copy. */
  private[sources] def swapInto(s: SparkSession, tmp: String,
      path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), s.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    if (fs.exists(old)) {
      if (fs.exists(dst)) {
        // both present: the earlier swap got past install; _old is stale
        fs.delete(old, true)
      } else {
        // crash window of a PRIOR swap: _old is the only committed copy
        require(fs.rename(old, dst),
          s"swap recovery failed restoring $old to $path")
      }
    }
    // rename reports failure via its RETURN VALUE — swallowing a
    // false would silently strand or lose the dataset
    if (fs.exists(dst))
      require(fs.rename(dst, old),
        s"swap failed moving $path aside; dataset untouched at $path")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"swap failed: new data at $tmp, previous data at $old")
    fs.delete(old, true)
  }

  /** Small-file compaction — an append-heavy partitioned dataset
    * accretes one-file-per-micro-batch until scan planning is
    * dominated by file-open overhead (the classic small-files
    * problem). Rewrite to `targetFiles` with a round-robin
    * repartition (even sizes, full parallelism while writing).
    * Two-phase: write to a sibling temp dir, then [[swapInto]] —
    * compaction must never destroy the only copy mid-rewrite. */
  def compact(s: SparkSession, path: String, targetFiles: Int): Unit = {
    val tmp = path + "_compacting"
    s.read.parquet(path).repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp)
    swapInto(s, tmp, path)
  }

  /** ORC round-trip — the second columnar format large estates
    * actually hold (Hive-era lakes are ORC; a migration engine must
    * read both and write either). Same declared-schema discipline as
    * parquet; ORC's row-group min/max + optional bloom indexes give
    * it the same data-skipping levers, and Spark's vectorized ORC
    * reader handles the scan. Zlib is ORC's widely-compatible
    * default codec (snappy for speed parity with parquet is a
    * one-option change). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zlib").orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** Schema-evolution read — a long-lived 100 TB dataset is written
    * by many pipeline versions, and later versions ADD columns. A
    * plain parquet read takes the schema from one random footer, so a
    * scan can silently miss newer columns (or fail on older files
    * depending on which footer wins). `mergeSchema` unions every
    * file's footer schema: old files surface the new columns as NULL,
    * which is exactly the semantics an append-only evolving dataset
    * wants. Footer merging costs one metadata pass (not a data scan);
    * turn it on per-read here rather than globally. Type WIDENING or
    * renames are NOT handled — that is a rewrite, not a merge, and
    * the reader fails loudly on conflicting types rather than guess. */
  def readParquetMerged(s: SparkSession, path: String): DataFrame =
    s.read.option("mergeSchema", true).parquet(path)

  /** Point-lookup parquet write — per-column PARQUET BLOOM FILTERS
    * for equality predicates on high-cardinality keys, the fourth
    * data-skipping lever beside partition pruning (low-cardinality
    * dirs), row-group min/max (range predicates on SORTED columns)
    * and z-order (multi-column boxes). A random key (uuid, doc id)
    * spans nearly the full value range in EVERY row group, so min/max
    * can never skip — a bloom filter answers "definitely not in this
    * row group" in one probe, and Spark's vectorized reader consults
    * it during pushdown automatically. Cost: ~1.2 bytes/NDV per row
    * group in the footer; size it with `expectedNdv` per row group,
    * not per table. */
  def writeWithBloomFilters(df: DataFrame, path: String,
      cols: Seq[String], expectedNdv: Long = 100000L): Unit =
    cols.foldLeft(df.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c",
          expectedNdv.toString)
    }.parquet(path)

  /** Hive-partitioned parquet sink — the dominant I/O lever at
    * 100 TB: a scan with a partition-key predicate reads ONLY the
    * matching directories (partition pruning, visible as
    * `PartitionFilters` in the scan node), so a day query over a
    * day-partitioned fact table touches one directory instead of the
    * whole table. Optional `sortCols` sorts within each output file
    * so parquet row-group min/max stats additionally skip pages for
    * range predicates on those columns (data skipping below the
    * partition grain). Partition columns should be low-cardinality —
    * one directory (and at least one file) per value. */
  def writePartitioned(df: DataFrame, path: String,
      partCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(df.col): _*)
    sorted.write.mode("overwrite")
      .partitionBy(partCols: _*).parquet(path)
  }

  // ---- sink oracle gates -------------------------------------------

  /** The round-trip payload: the g1-shaped flagship aggregate —
    * group strings, exact-decimal money sums emitted as double, and
    * a bigint count — covering every scalar class the sinks carry
    * (string, double, long). Tiny by construction (grouped to a
    * handful of rows), so the gate measures FORMAT fidelity, not
    * write throughput. */
  private def sinkAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(Det.dsum2(col("l_quantity")).as("sum_qty"),
        Det.dsum2(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows"))

  private def scratch(s: SparkSession, tag: String): String =
    Scratch.fresh(s, new org.apache.hadoop.fs.Path(
      sys.props("java.io.tmpdir"),
      s"graft_sink_$tag/${s.sparkContext.applicationId}"))

  /** S3 sink ORACLE GATE (VERDICT r9 §5: the CSV sink was
    * ScalaTest-only — the last §2 I/O edge without a DuckDB-compared
    * row): write [[sinkAgg]] through [[writeCsv]], read it back
    * through [[readCsv]] with the DECLARED schema, and return the
    * re-read frame; the oracle computes the same aggregate straight
    * from the parquet, so any value the header'd-UTF-8 round trip
    * bends (double shortest-repr print/parse, quoting, header order)
    * hash-mismatches. Doubles survive exactly because Spark prints
    * the shortest repr that parses back to the identical bits. */
  def s3CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val agg = sinkAgg(s, dir)
    val path = scratch(s, "csv")
    writeCsv(agg, path)
    readCsv(s, path, agg.schema)
  }

  /** S4 sink ORACLE GATE — the parquet twin of [[s3CsvRoundtrip]]:
    * binary columnar round trip of the same payload (saveRDS/readRDS,
    * R:1018–1027). Parquet carries the schema, so the read declares
    * nothing — type fidelity is part of what's gated. */
  def s4ParquetRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = scratch(s, "parquet")
    writeParquet(sinkAgg(s, dir), path)
    readParquet(s, path)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s3_csv_roundtrip" -> s3CsvRoundtrip,
    "s4_parquet_roundtrip" -> s4ParquetRoundtrip)

  private val sinkAggSql =
    s"""SELECT l_returnflag, l_linestatus,
         ${Det.sqlDsum2("l_quantity")} AS sum_qty,
         ${Det.sqlDsum2("l_extendedprice")} AS sum_price,
         cast(count(*) AS bigint) AS n_rows
       FROM lineitem GROUP BY 1, 2"""

  val oracle: Map[String, String] = Map(
    "s3_csv_roundtrip" -> sinkAggSql,
    "s4_parquet_roundtrip" -> sinkAggSql)
}

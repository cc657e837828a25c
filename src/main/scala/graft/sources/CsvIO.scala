package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

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
}

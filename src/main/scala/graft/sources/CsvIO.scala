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
}

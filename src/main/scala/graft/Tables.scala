package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the testdata star schema (TESTDATA.md / FIXTURES.md §B).
  *
  * Mirrors the reference's catalog-by-filename-stem pattern
  * (reference R:78–97: glob `*.csv` → keyed list) as a name→DataFrame
  * loader over parquet. Parquet is the native format (reference
  * `saveRDS`/`readRDS` at R:1018–1027 ≈ columnar binary round-trip).
  *
  * Scale note: every loader is a plain `spark.read.parquet` scan —
  * column pruning and predicate pushdown reach the scan via Catalyst,
  * so callers should express filters/projections on the returned
  * DataFrame rather than materializing intermediates.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(raw) else raw
  }

  /** Normalize `events.ts` to session-zone TimestampType regardless of
    * the parquet physical type the generator used:
    *  - TIMESTAMP(NANOS): no native Spark type; sessions set
    *    spark.sql.legacy.parquet.nanosAsLong=true so it arrives as
    *    LongType epoch-nanos → integer-divide to micros (a double
    *    division would lose precision: epoch-nanos ≈ 1.7e18 > 2^53).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TimestampNTZType → reinterpret as UTC (sessions pin
    *    spark.sql.session.timeZone=UTC, matching DuckDB's naive read).
    *  - already TimestampType: pass through. */
  private def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ→LTZ cast interprets the wall-clock in the session zone
        // (pinned to UTC), i.e. the same instant DuckDB's naive read
        // produces.
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }

  /** Register every table as a temp view (catalog semantics, R:81). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Streaming twin of `events`: a file-stream source needs a
    * DIRECTORY, so stream the sf dir with a glob filter for the one
    * file, declare the RAW schema, then apply the same ts
    * normalization as `load`. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    normalizeTs(spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
  }

  /** Streaming twin of `documents` (same directory-with-glob pattern
    * as `eventsStream`; no timestamp rewrite needed). */
  def documentsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

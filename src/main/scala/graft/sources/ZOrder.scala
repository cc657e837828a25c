package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered writes — multi-dimensional data
  * skipping, the file-layout lever the reference's single-machine
  * pipeline never needs but a 100 TB lake lives on.
  *
  * A sort on ONE column gives parquet min/max skipping on that column
  * only; a range predicate on any other column still reads every
  * file. Interleaving the bits of two (or more) columns' scaled ranks
  * produces a single sort key whose contiguous ranges are small
  * RECTANGLES in the original space (Morton 1966; the same layout
  * Delta Lake/Iceberg expose as OPTIMIZE ZORDER BY), so a conjunctive
  * box predicate over BOTH columns touches only the few files whose
  * z-range intersects the box — file-level pruning via parquet
  * row-group stats on the z-sorted data, no index structure needed.
  *
  * The z-value is a flat shift/mask expression tree over built-ins
  * (shiftright / bit-and / shiftleft / bit-or): whole-stage-codegen'd,
  * no UDF, and exactly reproducible as integer SQL in any engine —
  * which is what lets the oracle hash-gate it bit-for-bit.
  */
object ZOrder {

  /** Bit-interleave two non-negative longs, `bits` bits each:
    * bit b of x lands at position 2b, bit b of y at 2b+1. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).flatMap { b =>
      Seq(
        shiftleft(shiftrightunsigned(x, b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftrightunsigned(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)

  /** The identical interleave as engine-portable integer SQL
    * (`>> & << |` on bigint — bit-exact in DuckDB and Spark). */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { b =>
      Seq(s"(((($x) >> $b) & 1) << ${2 * b})",
        s"(((($y) >> $b) & 1) << ${2 * b + 1})")
    }.mkString(" | ")

  /** Scale a numeric column to [0, 2^bits) by min/max — z-order needs
    * RANK-like uniformity, not raw values (interleaving raw skewed
    * values wastes high bits). min/max come from one cheap agg pass at
    * write time; `greatest(..., 1)` guards a constant column. */
  private def scaled(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = math.max(hi - lo, 1e-300)
    least(
      floor((c.cast("double") - lit(lo)) / lit(span) * lit((1L << bits) - 1)),
      lit((1L << bits) - 1.0)).cast("long")
  }

  /** Write `df` parquet clustered on the z-curve of (cx, cy):
    * range-partition into `numFiles` z-ranges (each output file is a
    * z-contiguous rectangle set), sort within each file so row-group
    * min/max stats are tight. The helper column is dropped before the
    * write — the projection after the sort keeps partitioning and
    * row order (no exchange), so the layout survives. */
  def zOrderWrite(df: DataFrame, path: String,
      cx: String, cy: String, numFiles: Int, bits: Int = 16): Unit =
    zCluster(df, cx, cy, numFiles, bits)
      .write.mode("overwrite").parquet(path)

  /** The layout half of [[zOrderWrite]]: `df` range-partitioned into
    * `numFiles` z-ranges of (cx, cy) and sorted within each, ready
    * for any writer (the snapshot store's OPTIMIZE ZORDER commits
    * this through its own data path). */
  def zCluster(df: DataFrame, cx: String, cy: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    val r = df.agg(
      min(col(cx)).cast("double"), max(col(cx)).cast("double"),
      min(col(cy)).cast("double"), max(col(cy)).cast("double")).head()
    val z = zValue(
      scaled(col(cx), r.getDouble(0), r.getDouble(1), bits),
      scaled(col(cy), r.getDouble(2), r.getDouble(3), bits), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** S8 — the z-value kernel itself, oracle-gated bit-for-bit: the
    * interleave of (c_custkey, c_nationkey) at 16 bits. Layout-level
    * skipping is asserted in ZOrderSpec (file-count pruning on a box
    * predicate); hashing the curve position pins the arithmetic. */
  def s8ZorderValue(s: SparkSession, dir: String): DataFrame =
    graft.Tables.customer(s, dir).select(
      col("c_custkey"),
      zValue(col("c_custkey").cast("long"),
        col("c_nationkey").cast("long")).as("zval"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s8_zorder_value" -> s8ZorderValue)

  val oracle: Map[String, String] = Map(
    "s8_zorder_value" ->
      s"""SELECT c_custkey,
         (${zValueSql("cast(c_custkey AS bigint)",
        "cast(c_nationkey AS bigint)")}) AS zval
         FROM customer""")
}

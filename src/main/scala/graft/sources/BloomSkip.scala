package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Parquet bloom-filter row-group skipping — the point-lookup lever
  * for a 100 TB fact table.
  *
  * Min/max row-group statistics only prune when the data is laid out
  * in key order; a fact sorted for its DOMINANT access path (here
  * custkey) has every row group's orderkey range spanning nearly the
  * whole key space, so an orderkey point lookup reads everything.
  * Writing a parquet bloom filter on the secondary key gives the
  * reader a probabilistic row-group skip that works REGARDLESS of
  * layout: a group whose filter definitely lacks the key is never
  * read. This is the standard companion to Z-ordering (s8) when there
  * are more point-lookup columns than one clustering can serve.
  *
  * The demo writes `orders` custkey-sorted with a bloom filter on
  * `o_orderkey` (ndv-sized), then runs a 5-key IN lookup, which Spark
  * pushes down to the parquet reader as an In filter —
  * [[graft.BucketingSpec]] asserts the filter reaches PushedFilters
  * AND that every row group in the written footer carries a bloom
  * filter for the column. Hash-gated: the lookup result must equal
  * the same selection on the original table (the oracle derives the
  * same 5 keys by subquery).
  */
object BloomSkip {

  /** S18 — bloom-filtered point lookup over a custkey-sorted copy. */
  def s18BloomPointLookup(s: SparkSession, dir: String): DataFrame = {
    val root = writeBloomCopy(s, dir)
    // the same 5 keys the oracle subquery selects: smallest orderkeys
    // ≡ 7 (mod 10). Bounded 5-row collect — the keys must be LITERALS
    // for the scan to receive a pushable In filter.
    val keys = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 10 === 7)
      .orderBy("o_orderkey").limit(5)
      .collect().map(_.getLong(0))
    s.read.parquet(root)
      .filter(col("o_orderkey").isin(keys: _*))
      .select("o_orderkey", "o_custkey", "o_orderpriority",
        "o_totalprice")
  }

  /** Write the custkey-sorted, orderkey-bloom-filtered copy; returns
    * its path. Split out so the spec can inspect the footer. */
  private[graft] def writeBloomCopy(s: SparkSession, dir: String)
      : String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    // applicationId suffix: concurrent sessions (parallel bench
    // harnesses on one host) get disjoint scratch dirs instead of
    // racing on delete/overwrite of a shared path
    val root = new org.apache.hadoop.fs.Path(
      sys.props("java.io.tmpdir"),
      s"graft_s18${tag}_${s.sparkContext.applicationId}").toString
    Scratch.fresh(s, new org.apache.hadoop.fs.Path(root))
    // ndv sized from the table (metadata-only parquet count), not a
    // fixed constant: orderkey is unique, and the write fans out over
    // 4 range partitions, so per-file ndv ≈ count/4 — oversizing
    // wastes footer bytes at small sf, undersizing degrades FPP (and
    // thus the row-group skip) above sf1
    val ndv = math.max(1024L, Tables.orders(s, dir).count() / 4)
    CsvIO.writeWithBloomFilters(
      Tables.orders(s, dir)
        .repartitionByRange(4, col("o_custkey"))
        .sortWithinPartitions("o_custkey"),
      root, Seq("o_orderkey"), ndv)
    root
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s18_bloom_lookup" -> s18BloomPointLookup)

  val oracle: Map[String, String] = Map(
    "s18_bloom_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
         FROM orders
         WHERE o_orderkey IN (
           SELECT o_orderkey FROM orders
           WHERE o_orderkey % 10 = 7
           ORDER BY o_orderkey LIMIT 5)""")
}

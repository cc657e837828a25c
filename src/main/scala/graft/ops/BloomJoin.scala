package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.util.sketch.BloomFilter
import graft.Tables

/** Bloom-filter semi-join pruning (SURVEY §4's shuffle-minimization
  * note, taken one step further than broadcast).
  *
  * The gap this fills at 100 TB: a dimension filtered down to ~10⁵–10⁷
  * keys is too big to broadcast-hash-join comfortably, so the planner
  * shuffles BOTH sides — and almost every fact row it moves will find
  * no match and be dropped by the join. Distributed engines close the
  * gap with a runtime bloom filter on the build side's keys, pushed
  * into the probe side's scan (Spark's own runtime row-level filtering
  * does exactly this inside AQE; making it an explicit operator lets a
  * pipeline author apply it deterministically, size it, and reuse one
  * filter across several joins).
  *
  * Mechanics: one pass over the dim builds a bloom filter of
  * xxhash64(key) (mergeable — partial aggregation applies); the blob
  * lands on the driver (`optimalNumOfBits(n, fpp)/8` bytes — 1.2 MB
  * for 10⁶ keys at 1 % fpp, NOT O(data)) and rides to executors as a
  * literal inside a codegen'd `might_contain` predicate evaluated at
  * the fact scan, BEFORE the exchange. False positives only cost
  * wasted shuffle rows — the join afterwards removes them, so results
  * are exactly those of the plain join at any fpp.
  *
  * Uses Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions (the machinery behind
  * spark.sql.optimizer.runtime.bloomFilter), registered under graft
  * names — both are codegen'd; no UDF in the hot path.
  */
object BloomJoin {

  private val AggFn = "graft_bloom_agg"
  private val MightFn = "graft_might_contain"

  /** Idempotent session registration of the two internal expressions. */
  def register(s: SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(AggFn,
      es => new BloomFilterAggregate(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction(MightFn,
      es => BloomFilterMightContain(es(0), es(1)), "built-in")
  }

  /** One-pass bloom filter over `dim`'s key column; returns the
    * serialized filter (driver-side, ~`optimalNumOfBits/8` bytes). */
  def buildBloom(dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    register(dim.sparkSession)
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    dim.agg(call_function(AggFn, xxhash64(col(dimKey)),
        lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** `fact ⋈ dim` with the fact side bloom-pruned before its shuffle.
    * Row-identical to the plain join for any `fpp` — which is exactly
    * why only fact-side-REMOVING join types are accepted: the filter
    * drops fact rows before the join, so under left_outer/full_outer
    * an unmatched fact row the plain join would preserve with NULLs
    * would silently vanish. inner and left_semi are the types where a
    * pruned fact row was dead weight by definition. */
  def bloomPruneJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    val normalized = joinType.toLowerCase.replaceAll("[_ ]", "")
    require(Set("inner", "leftsemi", "semi").contains(normalized),
      s"bloomPruneJoin supports inner/left_semi, got '$joinType' " +
        "(pre-join pruning drops fact rows outer joins must preserve)")
    val blob = buildBloom(dim, dimKey, expectedItems, fpp)
    fact.filter(call_function(MightFn, lit(blob),
        xxhash64(col(factKey))))
      .join(dim, col(factKey) === col(dimKey), joinType)
  }

  /** The pruned fact side alone — for specs and for reusing one
    * filter across several downstream joins. */
  def prunedSide(fact: DataFrame, factKey: String, blob: Array[Byte])
      : DataFrame = {
    register(fact.sparkSession)
    fact.filter(call_function(MightFn, lit(blob),
      xxhash64(col(factKey))))
  }

  /** J7 — selective dim (≈6 % of parts) joined to lineitem through
    * the bloom prune. The oracle runs the PLAIN join: bit-identical
    * results are the point (false positives die in the join). */
  def j7BloomJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.part(s, dir).filter(col("p_size") <= 3)
      .select("p_partkey", "p_brand")
    bloomPruneJoin(Tables.lineitem(s, dir), "l_partkey",
        dim, "p_partkey", expectedItems = 100000L)
      .groupBy("p_brand")
      .agg(Det.dsum2(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j7_bloom_join" -> j7BloomJoin)

  val oracle: Map[String, String] = Map(
    "j7_bloom_join" ->
      s"""SELECT p_brand,
         ${Det.sqlDsum2("l_quantity")} AS sum_qty,
         count(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size <= 3
         GROUP BY 1""")
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Mergeable cardinality sketches — the shard-rollup pattern a
  * 100 TB corpus store runs daily: each ingest shard aggregates its
  * documents into ONE fixed-size HLL sketch (Apache DataSketches HLL
  * via Spark's `hll_sketch_agg`, ~2^lgK bytes regardless of input
  * size), the sketches persist beside the shard's manifest, and any
  * later "how many unique documents across shards X..Y" question is
  * answered by merging those sketches — NO rescan of the raw corpus.
  *
  * Why this scales where exact distinct doesn't: exact
  * count(DISTINCT) over 100 TB shuffles every distinct key once
  * (the dedup d1 path — right when you need the keys themselves);
  * the sketch path moves 16 KiB per shard however big the shards
  * are, and the merge is register-wise max — commutative,
  * associative, and idempotent, so re-merging overlapping scopes
  * never double-counts. The estimate is deterministic: DataSketches
  * HLL has no run-time randomness (hash seed is fixed), and
  * register-max is order-independent, so the same corpus always
  * yields the same estimate — SketchesSpec pins merged-vs-single-shot
  * EQUALITY, not closeness.
  *
  * Gate: rows-only by contract (DuckDB's HLL internals differ — no
  * cross-engine hash possible for estimates); SketchesSpec carries
  * the rigor: merge associativity (shard rollup == one-shot sketch)
  * and a relative-error bound vs the exact distinct count.
  */
object Sketches {

  /** Documents' content identity — the same md5-of-text fingerprint
    * d1 exact dedup groups on (one identity for dedup AND counting). */
  private def fingerprint = md5(col("text"))

  val Shards = 16

  /** Per-shard sketch build — what the ingest job would persist. The
    * shard key is the same xxhash64 mix every other shard-routing op
    * in the repo uses (x17 training shards, o3 sampling). */
  def shardSketches(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(pmod(xxhash64(col("doc_id")), lit(Shards))
        .cast("int").as("shard"))
      .agg(hll_sketch_agg(fingerprint).as("sk"),
        count(lit(1)).as("n_docs"))

  /** x18 — shard sketches + the merged global rollup (shard = -1),
    * one row per scope: (shard, n_docs, distinct_est). The global
    * row touches ONLY the 16 shard sketches, never the documents —
    * the plan shows one scan feeding both levels. */
  def x18SketchRollup(s: SparkSession, dir: String): DataFrame = {
    val shards = shardSketches(s, dir)
    val global = shards.agg(
      sum("n_docs").as("n_docs"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("distinct_est"))
      .select(lit(-1).cast("int").as("shard"), col("n_docs"),
        col("distinct_est"))
    shards.select(col("shard"), col("n_docs"),
        hll_sketch_estimate(col("sk")).as("distinct_est"))
      .unionByName(global)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x18_sketch_rollup" -> x18SketchRollup)

  /** Estimates are engine-specific — rows-only by contract. */
  val oracle: Map[String, String] = Map.empty
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det

/** Dynamic partition pruning (DPP) — the scan-elimination mechanism a
  * partitioned 100 TB fact table lives or dies by.
  *
  * Static pruning handles literal predicates on the partition column;
  * the common star-join shape ("facts for the dimension rows matching
  * this filter") has no literal on the fact side at plan time. Spark's
  * DPP closes that gap: when the fact is joined to a filtered dim ON
  * the fact's PARTITION column, Catalyst injects a runtime IN-subquery
  * into the fact scan's PartitionFilters — with a broadcast join it
  * reuses the already-built broadcast values, so the pruning is free —
  * and the scan skips every non-qualifying partition directory.
  * (Reference analogue: the region-filtered joins at R:214–230 run
  * eagerly over whole in-memory frames; at scale the same semantics
  * must instead never read the pruned data at all.)
  *
  * Scale shape: the fact scan reads |matching partitions| / |total
  * partitions| of the data (here 5 of 25 nation directories); the dim
  * side is a broadcast; the only shuffle is the final group-by. The
  * demo write is per-query for self-containment — a real estate
  * writes the partitioned layout once and amortizes it over every
  * subsequent pruned query.
  */
object PartitionPruning {

  /** S17 — write `customer` hive-partitioned by nationkey, then run
    * the canonical DPP shape against it: join to `nation` filtered to
    * ONE region (5 of 25 nations) on the partition column, aggregate
    * per nation. [[graft.BucketingSpec]] asserts the executed plan
    * carries a dynamicpruning expression in the fact scan and no
    * static partition filter. Hash-gated: the layout round-trip must
    * not change the answer, so the oracle is the same join over the
    * ORIGINAL table. */
  def s17DppJoin(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    // applicationId suffix: concurrent sessions (parallel bench
    // harnesses on one host) get disjoint scratch dirs instead of
    // racing on delete/overwrite of a shared path
    val root = new org.apache.hadoop.fs.Path(
      sys.props("java.io.tmpdir"),
      s"graft_s17${tag}_${s.sparkContext.applicationId}").toString
    Scratch.fresh(s, new org.apache.hadoop.fs.Path(root))
    CsvIO.writePartitioned(Tables.customer(s, dir), root,
      Seq("c_nationkey"))
    val fact = s.read.parquet(root)
    val dims = broadcast(Tables.nation(s, dir)
      .filter(col("n_regionkey") === 1)
      .select("n_nationkey", "n_name"))
    fact.join(dims, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_nationkey").cast("int").as("c_nationkey"),
        col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        Det.dsum2(col("c_acctbal")).as("acctbal_sum"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s17_dpp_join" -> s17DppJoin)

  val oracle: Map[String, String] = Map(
    "s17_dpp_join" ->
      s"""SELECT c_nationkey, n_name, count(*) AS n_customers,
         ${Det.sqlDsum2("c_acctbal")} AS acctbal_sum
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE n_regionkey = 1
         GROUP BY 1, 2""")
}

package graft

import org.apache.spark.sql.functions._

/** Cost-based-optimizer plumbing: ANALYZE TABLE feeds exact row
  * counts and per-column stats into the catalog, and with CBO on the
  * optimizer's cardinality estimates become selectivity-aware —
  * the machinery behind stats-driven broadcast/join-reorder decisions
  * on a real cluster (file-size estimates alone overestimate wildly
  * after selective filters). */
class StatsPlanningSpec extends SparkTestBase {

  test("ANALYZE gives exact rowCount; column stats shrink filter estimates") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stats").toString
    spark.sql("DROP TABLE IF EXISTS graft_orders_stats")
    Tables.orders(spark, sfSmoke)
      .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
      .write.option("path", s"$dir/orders_t")
      .saveAsTable("graft_orders_stats")
    try {
      val n = spark.table("graft_orders_stats").count()
      spark.sql("ANALYZE TABLE graft_orders_stats COMPUTE STATISTICS " +
        "FOR ALL COLUMNS")
      // plan-level rowCount/column stats surface under CBO estimation
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val withStats = spark.table("graft_orders_stats")
          .queryExecution.optimizedPlan.stats
        assert(withStats.rowCount.contains(BigInt(n)),
          s"expected exact rowCount $n, got ${withStats.rowCount}")
        // an equality filter on an analyzed column estimates ~n/ndv
        // rows, not the whole table
        val est = spark.table("graft_orders_stats")
          .filter(col("o_orderpriority") === "1-URGENT")
          .queryExecution.optimizedPlan.stats
        assert(est.rowCount.isDefined)
        val estimated = est.rowCount.get
        assert(estimated < BigInt(n) / 2,
          s"filter estimate should use column NDV: $estimated of $n")
        assert(estimated > 0)
      } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_orders_stats")
    }
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MERGE INTO (upsert) over plain parquet — the CDC/correction
  * write path every long-lived dataset eventually needs: matched
  * keys take the source row wholesale, unmatched target rows
  * persist, unmatched source rows insert.
  *
  * Copy-on-write execution: ONE full-outer join on the key (the only
  * shuffle; AQE picks broadcast when the change-set is small, which
  * it usually is for CDC), a per-column resolve in favor of the
  * source side, then the same two-phase temp-dir-and-swap write as
  * [[CsvIO.compact]] so a crash mid-merge never leaves the dataset
  * half-rewritten. This is exactly how table formats without
  * deletion vectors execute MERGE; at 100 TB the refinement is
  * partition-pruned copy-on-write (only rewrite partitions the
  * source touches) — compose with [[CsvIO.writePartitioned]].
  */
object MergeInto {

  /** The merge RESULT as a pure DataFrame (oracle surface): source
    * rows win on key match, both sides' unmatched rows survive.
    * Assumes `source` shares `target`'s schema; the key must be
    * unique per side (CDC change-sets are keyed snapshots). */
  def mergedView(target: DataFrame, source: DataFrame,
      key: String): DataFrame = {
    val t = target.alias("t")
    val s = source.alias("s")
    val matched = col(s"s.$key").isNotNull
    val cols = target.columns.map { c =>
      when(matched, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
      .select(cols.toIndexedSeq: _*)
  }

  /** Merge `source` into the parquet dataset at `path`, crash-safe. */
  def mergeInto(s: SparkSession, path: String, source: DataFrame,
      key: String): Unit = {
    val tmp = path + "_merging"
    mergedView(s.read.parquet(path), source, key)
      .write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), s.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** S9 — the merge result over a deterministic change-set: every
    * 10th customer gets a balance bump (update), every 100th
    * reappears under an offset key (insert). The oracle re-derives
    * the identical full-outer resolve in SQL. */
  def s9MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val target = Tables.customer(s, dir)
      .select("c_custkey", "c_name", "c_acctbal")
    val updates = target.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
    val inserts = target.filter(col("c_custkey") % 100 === 0)
      .withColumn("c_custkey", col("c_custkey") + 1000000L)
    mergedView(target, updates.union(inserts), "c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s9_merge_upsert" -> s9MergeUpsert)

  val oracle: Map[String, String] = Map(
    "s9_merge_upsert" ->
      """WITH tgt AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
         src AS (
           SELECT c_custkey, c_name, c_acctbal + 1000.0 AS c_acctbal
           FROM tgt WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT c_custkey + 1000000, c_name, c_acctbal
           FROM tgt WHERE c_custkey % 100 = 0)
         SELECT
           CASE WHEN s.c_custkey IS NOT NULL
                THEN s.c_custkey ELSE t.c_custkey END AS c_custkey,
           CASE WHEN s.c_custkey IS NOT NULL
                THEN s.c_name ELSE t.c_name END AS c_name,
           CASE WHEN s.c_custkey IS NOT NULL
                THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal
         FROM tgt t FULL OUTER JOIN src s
           ON t.c_custkey = s.c_custkey""")
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // presence flag, not `s.key IS NOT NULL`: a source row with a NULL
    // merge key never equi-joins, and keying "matched" off the key
    // column would then select the all-NULL target side — silently
    // corrupting the row. The flag is non-null exactly when the source
    // side of the full-outer row exists.
    val s = source.withColumn("__s_present", lit(true)).alias("s")
    val matched = col("s.__s_present").isNotNull
    val cols = target.columns.map { c =>
      when(matched, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
      .select(cols.toIndexedSeq: _*)
  }

  /** Merge `source` into the parquet dataset at `path`, crash-safe:
    * the rewrite lands in a temp dir, then [[CsvIO.swapInto]] swaps it
    * live via rename-aside (some directory holds the data at every
    * instant — see the swap's recovery rule). */
  def mergeInto(s: SparkSession, path: String, source: DataFrame,
      key: String): Unit = {
    val tmp = path + "_merging"
    mergedView(s.read.parquet(path), source, key)
      .write.mode("overwrite").parquet(tmp)
    CsvIO.swapInto(s, tmp, path)
  }

  /** Partition-pruned copy-on-write MERGE — the 100 TB refinement the
    * plain [[mergeInto]] doc promises: against a hive-partitioned
    * table, rewrite ONLY the partitions the change-set touches. The
    * touched-partition list is one small distinct-collect (bounded by
    * the table's partition count — change-sets are keyed snapshots,
    * partitions are low-cardinality by the writePartitioned
    * contract), then each touched partition runs an independent
    * slice-merge + two-phase swap; untouched partitions — the
    * overwhelming majority between commits of a day-partitioned fact
    * table — are never read, never rewritten. MERGE keys match WITHIN
    * a partition (key + partition column is the effective match key,
    * the Delta `replaceWhere` contract): a source row must carry its
    * key's CURRENT partition value — partition-moving a key is a
    * delete+insert the caller expresses explicitly. Crash-safety is
    * per-partition (the swap's rename-aside rule); reader ISOLATION
    * across partitions is not provided here — that is
    * [[SnapshotStore]]'s job (commit the post-merge file set as a
    * manifest for readers that need a consistent multi-partition
    * view). Returns the touched partition values. */
  def mergeIntoPartitioned(s: SparkSession, path: String,
      source: DataFrame, key: String, partCol: String): Seq[String] = {
    val hfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), s.sparkContext.hadoopConfiguration)
    val touched = source.select(partCol).distinct()
      .collect().map(_.get(0).toString).sorted.toIndexedSeq
    touched.foreach { v =>
      // hive-escape the value exactly as partitionBy writes it: a
      // raw "p=X:Y" path would miss the real "p=X%3AY" dir, branch
      // into brand-new-partition, and duplicate the partition's rows
      val pDir = s"$path/$partCol=" +
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(v)
      val slice = source.filter(col(partCol) === v).drop(partCol)
      if (!hfs.exists(new org.apache.hadoop.fs.Path(pDir))) {
        // brand-new partition: nothing to merge against
        slice.write.parquet(pDir)
      } else {
        val tmp = pDir + "_merging"
        mergedView(s.read.parquet(pDir), slice, key)
          .write.mode("overwrite").parquet(tmp)
        CsvIO.swapInto(s, tmp, pDir)
      }
    }
    touched
  }

  /** S13 — partition-pruned merge end-to-end: orders partitioned by
    * priority, a change-set touching exactly two of the five
    * partitions (price bump in 2-HIGH, inserts into 5-LOW), read back
    * whole. The oracle re-derives the merged table from the base
    * relation; the PRUNING (untouched partition files bit-identical)
    * is pinned in SourcesSessionSpec. */
  def s13PartitionedMerge(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new org.apache.hadoop.fs.Path(
      sys.props("java.io.tmpdir"),
      s"graft_s13${tag}_${s.sparkContext.applicationId}").toString
    Scratch.fresh(s, new org.apache.hadoop.fs.Path(root))
    CsvIO.writePartitioned(base, root, Seq("o_orderpriority"))
    val changes = base
      .filter(col("o_orderpriority") === "2-HIGH" &&
        col("o_orderkey") % 20 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .union(base
        .filter(col("o_orderpriority") === "5-LOW" &&
          col("o_orderkey") % 100 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 5000000L))
    mergeIntoPartitioned(s, root, changes, "o_orderkey",
      "o_orderpriority")
    s.read.parquet(root)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
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

  /** SCD Type 2 — history-preserving dimension maintenance: instead
    * of overwriting a changed row (s9), CLOSE the current version
    * (valid_to = change time) and insert the new one, so every fact
    * can still join the attribute values that were true at ITS time
    * (via j5/j6's as-of machinery). One full-outer join between the
    * current slice and the change-set; four row fates, decided with
    * null-safe attribute comparison (`<=>`) so a no-op change-set row
    * creates NO new version:
    *   target-only → unchanged; match+identical → unchanged;
    *   match+differs → closed copy AND a new current version;
    *   source-only → brand-new current row.
    * Closed history rows never join anything — at scale, partition
    * the table by is_current so maintenance touches only the current
    * slice. */
  def scd2Apply(history: DataFrame, changes: DataFrame, key: String,
      changeTs: Long): DataFrame = {
    val meta = Set(key, "valid_from", "valid_to", "is_current")
    val attrs = history.columns.filterNot(meta)
    val histCols = history.columns
    val closedPast = history.filter(!col("is_current"))
    // side presence is a lit(true) flag, not `key IS NOT NULL` — a
    // null-key row on either side never equi-joins, and reading
    // absence off the key column would misfile it (a null-key current
    // row would be rebuilt from the all-NULL source side)
    val cur = history.filter(col("is_current"))
      .withColumn("__t_present", lit(true))
    val src = changes.select(lit(true).as("__s_present") +:
      col(key).as("s_key") +:
      attrs.map(c => col(c).as(s"s_$c")): _*)
    val j = cur.join(src, col(key) === col("s_key"), "full_outer")
    val differs = attrs.map(c => !(col(c) <=> col(s"s_$c")))
      .reduce(_ || _)
    // every joined row resolves to 1 or 2 output rows in ONE pass:
    // an explode over a per-row fate array, NOT a union of filtered
    // re-selections of the join — Catalyst does not share common
    // subplans across union branches, so the union form executes the
    // full-outer join once per branch (3× the shuffle at scale)
    def asStruct(f: String => Column): Column =
      struct(histCols.map(c => f(c).as(c)).toIndexedSeq: _*)
    val keepRow = asStruct(col)
    val closedRow = asStruct {
      case "valid_to" => lit(changeTs).cast("bigint")
      case "is_current" => lit(false)
      case c => col(c)
    }
    val newRow = asStruct {
      case `key` => col("s_key")
      case "valid_from" => lit(changeTs).cast("bigint")
      case "valid_to" => lit(null).cast("bigint")
      case "is_current" => lit(true)
      case c => col(s"s_$c")
    }
    val tPresent = col("__t_present").isNotNull
    val sPresent = col("__s_present").isNotNull
    val fate = when(tPresent && (!sPresent || !differs), array(keepRow))
      .when(tPresent && sPresent && differs,
        array(closedRow, newRow))
      .otherwise(array(newRow)) // source-only insert
    val resolved = j.select(explode(fate).as("r"))
      .select(histCols.map(c => col(s"r.$c")).toIndexedSeq: _*)
    closedPast.unionByName(resolved)
  }

  /** S10 — one SCD2 maintenance round over a deterministic
    * change-set: every 10th customer changes balance (new version),
    * every (30k+5)th arrives UNCHANGED (must create nothing), every
    * 100th inserts under an offset key. */
  def s10Scd2(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val history = base
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("bigint"))
      .withColumn("is_current", lit(true))
    val changes = base.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 500.0)
      .union(base.filter(col("c_custkey") % 30 === 5))
      .union(base.filter(col("c_custkey") % 100 === 0)
        .withColumn("c_custkey", col("c_custkey") + 2000000L))
    scd2Apply(history, changes, "c_custkey", changeTs = 100L)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s9_merge_upsert" -> s9MergeUpsert,
    "s10_scd2" -> s10Scd2,
    "s13_partitioned_merge" -> s13PartitionedMerge)

  val oracle: Map[String, String] = Map(
    "s13_partitioned_merge" ->
      """SELECT o_orderkey, o_orderpriority,
           CASE WHEN o_orderpriority = '2-HIGH' AND o_orderkey % 20 = 0
                THEN o_totalprice + 10.0 ELSE o_totalprice END
             AS o_totalprice
         FROM orders
         UNION ALL
         SELECT o_orderkey + 5000000, o_orderpriority, o_totalprice
         FROM orders
         WHERE o_orderpriority = '5-LOW' AND o_orderkey % 100 = 0""",
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
           ON t.c_custkey = s.c_custkey""",
    "s10_scd2" ->
      """WITH base AS (
           SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
         chg AS (
           SELECT c_custkey, c_mktsegment, c_acctbal + 500.0 AS c_acctbal
           FROM base WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT c_custkey, c_mktsegment, c_acctbal
           FROM base WHERE c_custkey % 30 = 5
           UNION ALL
           SELECT c_custkey + 2000000, c_mktsegment, c_acctbal
           FROM base WHERE c_custkey % 100 = 0),
         j AS (
           SELECT t.c_custkey AS t_key, t.c_mktsegment, t.c_acctbal,
             s.c_custkey AS s_key, s.c_mktsegment AS s_seg,
             s.c_acctbal AS s_bal,
             (NOT (t.c_mktsegment IS NOT DISTINCT FROM s.c_mktsegment)
              OR NOT (t.c_acctbal IS NOT DISTINCT FROM s.c_acctbal))
               AS differs
           FROM base t FULL OUTER JOIN chg s
             ON t.c_custkey = s.c_custkey)
         SELECT t_key AS c_custkey, c_mktsegment, c_acctbal,
           cast(0 AS bigint) AS valid_from,
           cast(NULL AS bigint) AS valid_to, true AS is_current
         FROM j WHERE t_key IS NOT NULL AND (s_key IS NULL OR NOT differs)
         UNION ALL
         SELECT t_key, c_mktsegment, c_acctbal,
           cast(0 AS bigint), cast(100 AS bigint), false
         FROM j WHERE t_key IS NOT NULL AND s_key IS NOT NULL AND differs
         UNION ALL
         SELECT s_key, s_seg, s_bal,
           cast(100 AS bigint), cast(NULL AS bigint), true
         FROM j WHERE s_key IS NOT NULL AND (t_key IS NULL OR differs)""")
}

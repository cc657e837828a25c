package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot commits — the minimal lakehouse commit
  * protocol a 100 TB corpus store needs for readers to see a
  * CONSISTENT multi-file table while writers rewrite it (the gap
  * [[CsvIO.swapInto]] cannot close: a directory swap is atomic for
  * one directory, but gives no isolation across a multi-file rewrite
  * and destroys history).
  *
  * Layout (all under the table root):
  * {{{
  *   data/snap-<uuid>/part-*.parquet   -- immutable once written
  *   manifests/m-<%012d>              -- one line per data file path
  * }}}
  *
  * Protocol (the public Delta/Iceberg commit idea, reduced to its
  * core):
  *  1. write the new snapshot's data files to a FRESH `data/snap-*`
  *     directory — no reader can be looking at it;
  *  2. write the manifest (the file list) to a temp name, then
  *     RENAME it to the next `m-<id>` — the rename is the commit
  *     point. HDFS rename is an atomic metadata op that FAILS if the
  *     destination exists, so two racing committers cannot both win
  *     an id: the loser rescans and retries with the next one
  *     (optimistic concurrency).
  *
  * Readers list `manifests/`, pick the highest id, and read EXACTLY
  * the files that manifest names — never a directory listing of
  * `data/`, so a half-written snapshot (crash between 1 and 2) is
  * simply invisible, and a commit that lands mid-read does not
  * change the file set the reader already resolved. Old snapshots
  * stay readable (time travel by manifest id) until [[vacuum]]
  * deletes data directories no manifest references.
  *
  * Scale note: the manifest is one small file per commit — O(files)
  * text, not data; reads cost one listing of `manifests/` (bounded
  * by commit count, and checkpointable the way Delta does if that
  * ever dominates). Object stores without atomic rename need a
  * conditional-put or a coordination service for step 2 — same
  * contract, different primitive. */
object SnapshotStore {

  private def fs(s: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "manifests")
  private def manifestPath(root: String, id: Long) =
    new Path(manifestDir(root), f"m-$id%012d")

  /** Ids of all committed snapshots, ascending (empty for a fresh or
    * nonexistent table). Temp (uncommitted) manifests are excluded by
    * the name filter. */
  def snapshots(s: SparkSession, root: String): Seq[Long] = {
    val f = fs(s, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("m-\\d{12}"))
      .map(_.stripPrefix("m-").toLong)
      .sorted
  }

  /** Commit `df` as the table's next snapshot; returns its id.
    * Data lands in a fresh immutable directory first; the manifest
    * rename is the only step that makes it visible. */
  def commit(df: DataFrame, root: String, maxRetries: Int = 10): Long = {
    val s = df.sparkSession
    val f = fs(s, root)
    val dataDir = new Path(root, s"data/snap-${UUID.randomUUID()}")
    df.write.parquet(dataDir.toString)
    // the snapshot's file list: exactly the parquet parts just written
    val files = f.listStatus(dataDir).toSeq
      .map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(_.toString)
      .sorted
    require(files.nonEmpty, s"empty snapshot write at $dataDir")
    f.mkdirs(manifestDir(root))
    var attempt = 0
    var committed = -1L
    while (committed < 0 && attempt < maxRetries) {
      val id = snapshots(s, root).lastOption.getOrElse(-1L) + 1L
      val tmp = new Path(manifestDir(root), s".tmp-${UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write((files.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // rename-if-absent IS the commit: losing a race leaves the new
      // manifest as an invisible temp file, retried under the next id
      if (f.exists(manifestPath(root, id)) || !f.rename(tmp, manifestPath(root, id))) {
        f.delete(tmp, false)
        attempt += 1
      } else committed = id
    }
    if (committed < 0) throw new IllegalStateException(
      s"snapshot commit lost $maxRetries id races at $root")
    committed
  }

  /** The file list a snapshot pins (latest when `id` is None). */
  def manifestFiles(s: SparkSession, root: String,
      id: Option[Long] = None): Seq[String] = {
    val ids = snapshots(s, root)
    require(ids.nonEmpty, s"no committed snapshot at $root")
    val pick = id.getOrElse(ids.last)
    require(ids.contains(pick), s"snapshot $pick not found (have $ids)")
    val f = fs(s, root)
    val in = f.open(manifestPath(root, pick))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Read the latest snapshot — exactly the manifest's files, never a
    * directory listing. */
  def read(s: SparkSession, root: String): DataFrame =
    readSnapshot(s, root, None)

  /** Time travel: read snapshot `id` (or latest). */
  def readSnapshot(s: SparkSession, root: String,
      id: Option[Long]): DataFrame = {
    val files = manifestFiles(s, root, id)
    s.read.parquet(files: _*)
  }

  /** Keyed row-level CHANGES between two snapshots — the incremental
    * read (Delta CDF / "table_changes") that turns a snapshot store
    * into a pipeline source: a downstream consumer processes only
    * what moved between commits instead of re-reading the table. One
    * full-outer join on the key (the same shape as
    * [[MergeInto.mergedView]], run in reverse): key only in `to` →
    * insert; key only in `from` → delete; key in both with any
    * attribute differing (null-safe `<=>`) → update, emitting the NEW
    * attribute values. Unchanged rows — the overwhelming majority of
    * a 100 TB table between commits — produce nothing, so downstream
    * work scales with the churn, not the table. The key must be
    * unique per snapshot (the same contract as merge). */
  def keyedChanges(from: DataFrame, to: DataFrame, key: String)
      : DataFrame = {
    import org.apache.spark.sql.functions._
    val attrs = from.columns.filterNot(_ == key)
    val o = from.alias("o")
    val n = to.alias("n")
    val differs = attrs.map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val change = when(col(s"o.$key").isNull, "insert")
      .when(col(s"n.$key").isNull, "delete")
      .when(differs, "update")
    val outCols = col("change_type") +:
      coalesce(col(s"n.$key"), col(s"o.$key")).as(key) +:
      attrs.map(c =>
        when(col(s"n.$key").isNotNull, col(s"n.$c"))
          .otherwise(col(s"o.$c")).as(c))
    o.join(n, col(s"o.$key") === col(s"n.$key"), "full_outer")
      .withColumn("change_type", change)
      .filter(col("change_type").isNotNull)
      .select(outCols.toIndexedSeq: _*)
  }

  /** The changes between two COMMITTED snapshot ids of a table. */
  def changesBetween(s: SparkSession, root: String, fromId: Long,
      toId: Long, key: String): DataFrame =
    keyedChanges(readSnapshot(s, root, Some(fromId)),
      readSnapshot(s, root, Some(toId)), key)

  /** S12 — the incremental read end-to-end THROUGH the commit
    * protocol: commit a customer slice as snapshot 0, commit a
    * deterministically-churned version (updates: every 10th key's
    * balance +250; deletes: every 97th ≡ 3; inserts: every 100th
    * reappears at +3M) as snapshot 1, then read back ONLY the
    * changes. The oracle re-derives the identical keyed diff in SQL
    * from the base table — the store must be a faithful pipe: what
    * went into the commits is exactly what the diff sees. The table
    * root is a fixed per-SF temp path wiped at entry (gated queries
    * re-run; stale manifests from a prior run must not shift ids). */
  def s12SnapshotChanges(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.customer(s, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val v1 = base.filter(col("c_custkey") % 97 =!= 3)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 10 === 0, col("c_acctbal") + 250.0)
          .otherwise(col("c_acctbal")))
      .union(base.filter(col("c_custkey") % 100 === 0)
        .withColumn("c_custkey", col("c_custkey") + 3000000L))
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"), s"graft_s12$tag/t").toString
    fs(s, root).delete(new Path(root).getParent, true)
    commit(base, root)
    commit(v1, root)
    changesBetween(s, root, 0L, 1L, "c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s12_snapshot_changes" -> s12SnapshotChanges)

  val oracle: Map[String, String] = Map(
    "s12_snapshot_changes" ->
      """WITH base AS (
           SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
         v1 AS (
           SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 250.0
                  ELSE c_acctbal END AS c_acctbal
           FROM base WHERE c_custkey % 97 <> 3
           UNION ALL
           SELECT c_custkey + 3000000, c_mktsegment, c_acctbal
           FROM base WHERE c_custkey % 100 = 0),
         j AS (
           SELECT o.c_custkey AS o_key, o.c_mktsegment AS o_seg,
             o.c_acctbal AS o_bal, n.c_custkey AS n_key,
             n.c_mktsegment AS n_seg, n.c_acctbal AS n_bal
           FROM base o FULL OUTER JOIN v1 n
             ON o.c_custkey = n.c_custkey)
         SELECT
           CASE WHEN o_key IS NULL THEN 'insert'
                WHEN n_key IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           coalesce(n_key, o_key) AS c_custkey,
           CASE WHEN n_key IS NOT NULL THEN n_seg ELSE o_seg END
             AS c_mktsegment,
           CASE WHEN n_key IS NOT NULL THEN n_bal ELSE o_bal END
             AS c_acctbal
         FROM j
         WHERE o_key IS NULL OR n_key IS NULL
           OR NOT (o_seg IS NOT DISTINCT FROM n_seg)
           OR NOT (o_bal IS NOT DISTINCT FROM n_bal)""")

  /** Delete data directories no manifest references (crashed commits
    * and vacuumed history). `keepLast` manifests are retained; older
    * manifest files AND the data dirs only they reference are
    * removed. Returns the number of data directories deleted. Safe
    * ordering: manifests are deleted FIRST, so a concurrent reader
    * can never resolve a manifest whose files are already gone —
    * it either sees the old manifest and its intact files (vacuum
    * not yet through) or neither. */
  def vacuum(s: SparkSession, root: String, keepLast: Int = 1): Int = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val f = fs(s, root)
    val ids = snapshots(s, root)
    val (drop, keep) = ids.splitAt(math.max(0, ids.length - keepLast))
    val keptFiles = keep.flatMap(i => manifestFiles(s, root, Some(i)))
      .map(p => new Path(p).getParent.toUri.getPath).toSet
    drop.foreach(i => f.delete(manifestPath(root, i), false))
    val dataRoot = new Path(root, "data")
    if (!f.exists(dataRoot)) return 0
    val stale = f.listStatus(dataRoot).toSeq
      .map(_.getPath)
      .filter(p => !keptFiles.contains(p.toUri.getPath))
    stale.foreach(p => f.delete(p, true))
    stale.length
  }
}

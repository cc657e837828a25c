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

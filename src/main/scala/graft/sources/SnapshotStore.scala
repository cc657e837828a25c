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
  *     (optimistic concurrency). The LOCAL filesystem's rename is
  *     POSIX rename(2) — it silently replaces an existing
  *     destination — so there the publish uses link(2) instead,
  *     which fails atomically with EEXIST ([[renameIfAbsent]]).
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

  /** Plant offsets for the churn fixtures (s12/s15/s25 inserts).
    * Powers of two far above any key the TPC-H generator emits at
    * ANY scale factor (orders max out near 6e6*sf) - an additive
    * 50M/3M offset would collide with real keys at sf >= ~8 and
    * break keyedChanges' unique-key contract. */
  private[sources] val FactPlantOffset = 1L << 40
  private[sources] val DimPlantOffset = 1L << 41

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

  private def latestHintPath(root: String) = new Path(root, "latest.hint")

  private def readHint(f: FileSystem, root: String): Long =
    try {
      val in = f.open(latestHintPath(root))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim finally in.close()
      txt.toLong
    } catch { case _: Exception => -1L }

  /** Best-effort advisory write of the latest-id hint (see
    * [[latestId]]); failures and races only cost later probes, so
    * every error is swallowed. Monotonic read-check first so a slow
    * writer doesn't regress the hint under contention. */
  private def writeHint(f: FileSystem, root: String, id: Long): Unit =
    try {
      if (readHint(f, root) < id) {
        val tmp = new Path(root, s".hint-tmp-${UUID.randomUUID()}")
        val out = f.create(tmp, true)
        try out.write(s"$id\n".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        f.delete(latestHintPath(root), false)
        // HDFS-semantics rename fails if a racer recreated the hint
        // first — drop our tmp either way so root never accumulates
        // .hint-tmp-* garbage (vacuum doesn't sweep root files)
        if (!f.rename(tmp, latestHintPath(root))) f.delete(tmp, false)
      }
    } catch { case _: Exception => () }

  /** Highest manifest id any vacuum has ever COMMITTED TO DELETE at
    * this root (monotonic; -1 before the first deleting vacuum;
    * write-ahead — recorded before the first deletion, so a crashed
    * vacuum can leave it higher than anything actually deleted,
    * which only costs a listing). Vacuum keeps PINNED old manifests
    * (branch refs, the trunk head) while deleting unpinned ids above
    * them, so the log can have gaps at or below this floor — but
    * never above it: ids > floor were never vacuumed, so the live
    * log is contiguous there.
    *
    * The floor is load-bearing for the no-fork guarantee, so unlike
    * the hint it is stored as an APPEND-ONLY set of marker files
    * (`vacuum.floor-<id>`), readFloor = max over their NAMES:
    *  - monotonic by construction — a concurrent vacuum recording a
    *    lower id adds a file that max() ignores, where a single
    *    read-check-overwrite file could REGRESS the floor below ids
    *    another vacuum is about to delete (the exact window the
    *    guard exists to close);
    *  - atomic visibility — each marker is created under a fresh
    *    unique name, so there is no delete+rename window in which a
    *    reader sees NO floor and trusts a gap-stopped probe;
    *  - crash-safe — the id lives in the NAME; a torn write of the
    *    (informational) content cannot corrupt the value.
    * Markers strictly below the max are garbage-collected
    * best-effort AFTER the new max is durable. */
  private val FloorPrefix = "vacuum.floor-"

  private def floorMarkerPath(root: String, id: Long) =
    new Path(root, f"$FloorPrefix$id%012d")

  /** The pre-marker single-file floor — still READ (max'd into the
    * marker set) so a store vacuumed by the earlier code keeps its
    * recorded floor across the upgrade; silently dropping it would
    * re-open the exact commit-fork window the floor closes (review
    * finding r9). Never written or deleted by the new code: a stale
    * legacy value can only RAISE the observed floor, which at worst
    * costs a listing. */
  private def legacyFloorPath(root: String) = new Path(root, "vacuum.floor")

  /** None = the legacy file EXISTS but could not be read (transient
    * FS error or torn content) — the floor is UNKNOWN, not absent.
    * A plain missing file is the normal no-legacy-store case (-1). */
  private def readLegacyFloor(f: FileSystem, root: String): Option[Long] =
    try {
      val in = f.open(legacyFloorPath(root))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim finally in.close()
      Some(txt.toLong)
    } catch {
      case _: java.io.FileNotFoundException => Some(-1L)
      case _: Exception => None
    }

  /** The observed vacuum floor, or None when it could not be
    * determined (marker listing or legacy read failed). FAIL CLOSED
    * on None (ADVICE r9): the floor exists precisely to stop readers
    * from trusting a gap-stopped hint probe over a vacuumed range —
    * a transient listing error that silently read as "-1 / no floor"
    * would re-open that exact fork window. Readers with an unknown
    * floor must take the full-listing path; vacuum with an unknown
    * floor must abort (its write-ahead verification fails). */
  private def readFloorOpt(f: FileSystem, root: String): Option[Long] =
    try {
      // \d{12,}: %012d PADS to 12 digits but renders ids ≥ 10^12 in
      // full — an exact {12} would stop parsing (and thus silently
      // disable vacuum's write-ahead guard) at that point
      val markers = f.listStatus(new Path(root)).iterator
        .map(_.getPath.getName)
        .filter(_.matches(s"$FloorPrefix\\d{12,}"))
        .map(_.stripPrefix(FloorPrefix).toLong)
      readLegacyFloor(f, root).map(markers.foldLeft(_)(math.max))
    } catch { case _: Exception => None }

  /** Durable monotonic floor update. Returns whether the recorded
    * floor is now ≥ `id` — verified by READ-BACK, not by trusting
    * the create call: vacuum must not delete a single manifest
    * unless this returns true (write-ahead contract, see [[vacuum]]).
    * Idempotent and race-free under concurrent vacuums: each writer
    * creates its own marker, max() resolves. */
  private def writeFloor(f: FileSystem, root: String, id: Long): Boolean =
    try {
      // unknown floor → write the marker anyway (monotonic max makes
      // a redundant marker harmless); the VERIFICATION below is what
      // must fail closed on unknown
      if (!readFloorOpt(f, root).exists(_ >= id)) {
        val out = f.create(floorMarkerPath(root, id), true)
        try out.write(s"$id\n".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      val ok = readFloorOpt(f, root).exists(_ >= id)
      if (ok) {
        // GC markers strictly below the (now-durable) max; a reader
        // racing this still sees the max marker, which is never
        // deleted, so the observed floor cannot dip
        try f.listStatus(new Path(root)).iterator
          .map(_.getPath.getName)
          .filter(_.matches(s"$FloorPrefix\\d{12,}"))
          .filter(_.stripPrefix(FloorPrefix).toLong < id)
          .foreach(n => f.delete(new Path(root, n), false))
        catch { case _: Exception => () }
      }
      ok
    } catch { case _: Exception =>
      try readFloorOpt(f, root).exists(_ >= id)
      catch { case _: Exception => false }
    }

  /** Resolve the LATEST snapshot id in O(hint lag) instead of
    * O(commits): the `latest.hint` file (the Delta `_last_checkpoint`
    * idea, reduced to a pointer) names a recent id; resolution starts
    * there and probes FORWARD with exists() until the first gap. The
    * hint is a best-effort LOWER bound — written last-writer-wins
    * after each commit, so a crash can omit it, a slow writer can
    * lag it, and vacuum can delete a regressed hint's manifest; all
    * three only cost extra probes or one fallback listing, never a
    * wrong answer, because only real manifests are believed. One
    * hazard needs an explicit guard: vacuum PINS branch-ref'd and
    * trunk-head manifests while deleting unpinned ids above them, so
    * a mid-log gap can exist and a hint lagged to a pinned id below
    * it would stop the probe early — returning a stale latest whose
    * successor id was already vacuumed, which the next commit would
    * then RECLAIM, silently forking the log. The guard is the
    * vacuum floor ([[vacuumFloorPath]]): ids above the floor were
    * never vacuumed, so a probe result ABOVE the floor proves
    * contiguity to the true head; a hint-derived result at or below
    * it is suspect and falls back to the listing (the truth). The
    * directory listing stays the truth for history()/time-travel;
    * this serves the HOT paths — every commit attempt and every
    * latest read — which would otherwise re-list O(commits) names on
    * a long-lived table. */
  private[sources] def latestId(s: SparkSession, root: String): Long = {
    val f = fs(s, root)
    val hinted = readHint(f, root)
    if (hinted >= 0 && f.exists(manifestPath(root, hinted))) {
      var k = hinted
      while (f.exists(manifestPath(root, k + 1))) k += 1
      // fail closed on an UNKNOWN floor (None): only a floor we
      // actually read proves the probed range was never vacuumed —
      // otherwise believe the listing (ADVICE r9)
      if (readFloorOpt(f, root).exists(k > _)) k
      else {
        // probe stopped inside the possibly-gapped region: believe
        // the listing, then re-probe forward past it (a commit can
        // land between the listing and here)
        var m = snapshots(s, root).lastOption.getOrElse(-1L).max(k)
        while (f.exists(manifestPath(root, m + 1))) m += 1
        m
      }
    } else {
      var k = snapshots(s, root).lastOption.getOrElse(-1L)
      while (f.exists(manifestPath(root, k + 1))) k += 1
      k
    }
  }

  /** DESCRIBE HISTORY — one row per committed snapshot: id, commit
    * wall-time (the manifest file's mtime — set by the rename that
    * made the snapshot visible, so it IS the visibility instant),
    * data-file count, total data bytes, and DV sidecar count. Pure
    * manifest/FileStatus metadata: no data file is opened, cost is
    * O(snapshots × manifest lines) at any table size. (A production
    * manifest would additionally pin rowCount per file at commit
    * time; this store keeps lines engine-portable and counts rows
    * only when a reader asks.) */
  def history(s: SparkSession, root: String)
      : Seq[(Long, Long, Int, Long, Int)] = {
    val f = fs(s, root)
    snapshots(s, root).map { id =>
      val files = manifestFiles(s, root, Some(id))
      val bytes = files.map(p => f.getFileStatus(new Path(p)).getLen).sum
      (id, f.getFileStatus(manifestPath(root, id)).getModificationTime,
        files.length, bytes, dvPaths(s, root, Some(id)).length)
    }
  }

  /** Time travel by WALL CLOCK (the Delta `TIMESTAMP AS OF` verb):
    * resolve the latest snapshot whose commit instant (manifest
    * mtime) is ≤ `tsMillis` and read it. The id form
    * ([[readSnapshot]]) is the deterministic API; this is the
    * human-facing one ("the table as of last night's run"). */
  def readAsOf(s: SparkSession, root: String, tsMillis: Long)
      : DataFrame = {
    // trunk lineage only: a staged (possibly unaudited) branch
    // commit must not leak into unqualified wall-clock time travel
    // any more than into read() — branch history travels through
    // readBranch + the branch's own ids
    val f = fs(s, root)
    val elig = history(s, root).filter(_._2 <= tsMillis)
      .map(_._1).sorted.reverse
      .find(i => !rawManifestLines(f, root, i)
        .exists(_.startsWith(RefMarker + "\t")))
    require(elig.nonEmpty, s"no trunk snapshot at or before $tsMillis")
    readSnapshot(s, root, Some(elig.get))
  }

  /** Commit `df` as the table's next snapshot; returns its id.
    * Data lands in a fresh immutable directory first; the manifest
    * rename is the only step that makes it visible. Declared CHECK
    * constraints are enforced on `df` (Delta semantics: EVERY write
    * that introduces rows validates — see [[checkedAppend]]). */
  def commit(df: DataFrame, root: String, maxRetries: Int = 10): Long = {
    enforceConstraints(df, root)
    val (s, files) = writeSnapshotData(df, root)
    commitManifest(s, root, files, maxRetries)
  }

  /** Gate shared by every verb that introduces NEW rows (commit /
    * appendCommit / commitWithStats / commitWithNdv /
    * appendToBranch): one O(batch) aggregate pass when constraints
    * are declared, free otherwise (a tiny listing). Rewrite verbs
    * (compaction, z-cluster, DV merges) deliberately skip it — they
    * only re-arrange rows that passed this gate when written, so
    * re-validating would add a full pass over rewritten data for
    * nothing. This is what makes the checkedAppend O(batch)
    * soundness argument airtight: no unchecked write can interleave,
    * because there is no unchecked write. */
  private def enforceConstraints(df: DataFrame, root: String): Unit = {
    val cs = constraintsOf(df.sparkSession, root)
    if (cs.nonEmpty) requireNoViolations(df, cs)
  }

  /** Phase 1 of a commit: land the data in a fresh immutable
    * directory and return the parquet part list. */
  private def writeSnapshotData(df: DataFrame, root: String)
      : (SparkSession, Seq[String]) = {
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
    (s, files)
  }

  /** Phase 2 of a commit: the manifest rename-if-absent race. Each
    * `lines` entry is a file path optionally followed by tab-separated
    * per-file metadata ([[commitWithStats]]). The FIXED-lines form:
    * the caller has already resolved what the new snapshot pins
    * (full-replacement commits, branch appends against a branch
    * head). Writers whose lines DEPEND on the latest snapshot must go
    * through [[commitRebase]], or a lost id race silently drops the
    * concurrent commit's lines. */
  private def commitManifest(s: SparkSession, root: String,
      lines: Seq[String], maxRetries: Int): Long =
    commitRebase(s, root, _ => lines, maxRetries)

  /** Optimistic-concurrency commit (the Delta/Iceberg commit-loop
    * shape): `mkLines` maps the CURRENT TRUNK head's lines (empty for
    * a fresh table) to the new manifest, and is re-evaluated on EVERY
    * attempt — losing the rename race re-reads the new base and
    * rebases, so a concurrent writer's lines are never dropped. The
    * base is passed LAZILY: fixed-line commits (branch appends,
    * full replacements) never open it, and a base manifest vanishing
    * mid-loop (a racing vacuum) counts as a lost race and retries
    * instead of surfacing an IO error. `mkLines` may throw (conflict
    * detection, [[commitRewrite]]) to abort the commit once the base
    * has changed incompatibly.
    *
    * Lineage: the claimed ID is the next GLOBAL one (one monotonic
    * log across trunk and branches, the Iceberg sequence-number
    * shape), but the REBASE BASE is the trunk head — a trunk append
    * that loses its race to a branch commit must not rebase onto the
    * branch's lineage, or its rows would land in a manifest no trunk
    * reader ever resolves (orphaned through an abandoned staging
    * branch). */
  private def commitRebase(s: SparkSession, root: String,
      mkLines: (() => Seq[String]) => Seq[String],
      maxRetries: Int): Long = {
    val f = fs(s, root)
    f.mkdirs(manifestDir(root))
    var attempt = 0
    var committed = -1L
    while (committed < 0 && attempt < maxRetries) {
      // hint-accelerated: O(probes) per attempt, not O(commits)
      val id = latestId(s, root) + 1L
      val baseThunk = () => trunkHead(s, root)._2
      (try Some(mkLines(baseThunk))
       catch {
         // base vanished under us (a racing vacuum between the id
         // resolution and the open): a lost race, not an IO failure
         case _: java.io.FileNotFoundException => None
       }) match {
        case None => attempt += 1
        case Some(lines) =>
          val tmp =
            new Path(manifestDir(root), s".tmp-${UUID.randomUUID()}")
          val out = f.create(tmp, false)
          try out.write((lines.mkString("\n") + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          // rename-if-absent IS the commit: losing a race leaves the
          // new manifest as an invisible temp, retried at the next id
          if (!renameIfAbsent(f, tmp, manifestPath(root, id))) {
            f.delete(tmp, false)
            attempt += 1
          } else {
            // pin mtime to the VISIBILITY instant: POSIX rename
            // preserves the write-time mtime, so under commit-retry
            // contention the file's timestamp could predate the
            // rename that made the snapshot readable —
            // history()/readAsOf need the commit instant
            f.setTimes(manifestPath(root, id),
              System.currentTimeMillis(), -1)
            writeHint(f, root, id)
            committed = id
          }
      }
    }
    if (committed < 0) throw new IllegalStateException(
      s"snapshot commit lost $maxRetries id races at $root")
    committed
  }

  /** The atomic commit point: publish `tmp` at `dst` iff `dst` does
    * not exist. On HDFS (and stores with HDFS rename semantics) the
    * rename itself fails when the destination exists, so
    * exists-check + rename is atomic. On the LOCAL filesystem it is
    * NOT: Hadoop's local rename is POSIX rename(2), which silently
    * REPLACES an existing destination — two racing commits could both
    * "win" and the second erase the first's manifest (the lost-update
    * this helper exists to prevent; observed as a dropped appender
    * slice in the s27 race). link(2) atomically fails with EEXIST
    * instead, so local commits hard-link the tmp to the final name
    * and then drop the tmp. */
  private def renameIfAbsent(f: FileSystem, tmp: Path, dst: Path): Boolean =
    if (f.getScheme == "file")
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        f.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        // Genuine I/O causes must SURFACE, not masquerade as lost id
        // races (a read-only root would otherwise loop to a
        // misleading "lost N id races" failure): rethrow the
        // specific subclasses that mean permission/missing-path.
        case e @ (_: java.nio.file.AccessDeniedException |
             _: java.nio.file.NoSuchFileException) => throw e
        // Not every mount Hadoop reports as scheme "file" supports
        // link(2) (overlay/network mounts throw the generic
        // FileSystemException "operation not supported" /
        // UnsupportedOperationException). Degrade to exists+rename —
        // the HDFS-path protocol, with its documented weaker
        // single-writer-per-instant guarantee — instead of crashing
        // every commit and leaking the tmp file.
        case _: java.nio.file.FileSystemException |
             _: UnsupportedOperationException =>
          !f.exists(dst) && f.rename(tmp, dst)
      }
    else !f.exists(dst) && f.rename(tmp, dst)

  /** The latest TRUNK manifest id: walk back from the global latest
    * skipping branch-lineage manifests (those carrying a
    * `ref\t<name>` marker line, [[appendToBranch]]). Bounded by the
    * run of branch commits at the head of the log; a vacuumed
    * manifest in the walk is skipped (vacuum only drops old ids).
    * -1 for a fresh table. */
  private def trunkLatestId(s: SparkSession, root: String): Long =
    trunkHead(s, root)._1

  /** [[trunkLatestId]] plus the head's lines, read once — commit
    * rebase and latest reads need both and must not pay a second
    * manifest open for them. (-1, empty) for a fresh table. */
  private def trunkHead(s: SparkSession, root: String)
      : (Long, Seq[String]) = {
    val f = fs(s, root)
    var k = latestId(s, root)
    var lines = Seq.empty[String]
    var found = false
    while (k >= 0 && !found) {
      try {
        val ls = rawManifestLines(f, root, k)
        if (ls.exists(_.startsWith(RefMarker + "\t"))) k -= 1
        else { lines = ls; found = true }
      } catch { case _: java.io.FileNotFoundException => k -= 1 }
    }
    (if (found) k else -1L, lines)
  }

  /** Shared line-list projections: the DATA paths and the DV sidecar
    * paths of one already-read manifest — derive both from a single
    * read so no reader can see files from one snapshot and DVs from
    * another (the reader-side TOCTOU). */
  private def dataFilesOf(lines: Seq[String]): Seq[String] =
    lines.map(_.split('\t'))
      .filter(a => !MetaMarkers(a.head)).map(_.head)
  private def dvsOf(lines: Seq[String]): Seq[String] =
    lines.map(_.split('\t')).collect { case Array(DvMarker, p) => p }

  /** A manifest line's conflict-detection identity: data lines are
    * keyed by path (stats suffixes may be rewritten by a concurrent
    * stats recompute without being a LOGICAL conflict), DV sidecar
    * and ref-marker lines by the full line. */
  private def lineKey(line: String): String = {
    val head = line.split('\t').head
    if (MetaMarkers(head)) line else head
  }

  /** Rewrite commit with logical conflict detection (the Delta OCC
    * rule): on each attempt the CURRENT base must still pin every
    * `required` and `removed` line key — if a concurrent rewrite
    * already compacted/deleted any of them, this writer's outputs
    * were derived from files that no longer exist and committing
    * would corrupt the table (resurrected or lost rows), so it
    * aborts with ConcurrentModificationException instead. Lines
    * neither removed nor re-added are carried from the CURRENT base,
    * so blind concurrent APPENDS rebase in automatically and never
    * conflict with a rewrite. */
  private[sources] def commitRewrite(s: SparkSession, root: String,
      required: Set[String], removed: Set[String], added: Seq[String],
      maxRetries: Int): Long =
    commitRebase(s, root, { baseThunk =>
      val base = baseThunk()
      val baseKeys = base.map(lineKey).toSet
      val gone = (required ++ removed).filterNot(baseKeys)
      if (gone.nonEmpty) throw new java.util.ConcurrentModificationException(
        s"conflicting concurrent rewrite at $root: ${gone.mkString(", ")}")
      // a DV sidecar in the CURRENT base that this rewrite neither
      // removes nor adds is a concurrent merge-on-read DELETE that
      // landed after our read: our outputs were derived WITHOUT its
      // dead positions, and carrying it forward would point at files
      // we are dropping — committing would resurrect the deleted
      // rows (Delta's concurrent-delete-read conflict). Abort.
      val addedKeys = added.map(lineKey).toSet
      val unseenDvs = base.filter(_.startsWith(DvMarker + "\t"))
        .map(lineKey).filterNot(k => removed(k) || addedKeys(k))
      if (unseenDvs.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"concurrent delete landed at $root: ${unseenDvs.mkString(", ")}")
      base.filterNot(l => removed(lineKey(l))) ++ added
    }, maxRetries)

  /** Commit with per-file [min,max] stats on `statsCol` embedded in
    * the manifest — file-level DATA SKIPPING (the Delta/Iceberg
    * min-max stats idea): a later range read resolves which files can
    * contain matching rows from the manifest ALONE and never opens
    * the rest. Stats only pay when the layout clusters the column —
    * pair with `repartitionByRange`/z-order at write time so each
    * file owns a narrow range (a random layout makes every file's
    * range span everything and prunes nothing). Stats cost one
    * grouped scan of the just-written files at commit time (a
    * footer-reading engine gets them for free; the scan keeps this
    * store engine-portable). Values travel as strings and are cast
    * back to the column's type at prune time — numeric, date, and
    * timestamp columns all round-trip through Spark's cast. */
  def commitWithStats(df: DataFrame, root: String, statsCol: String,
      maxRetries: Int = 10): Long = {
    enforceConstraints(df, root)
    val (s, files) = writeSnapshotData(df, root)
    commitManifest(s, root, statsLinesFor(s, files, statsCol),
      maxRetries)
  }

  /** The stats-bearing manifest lines for `files` — one grouped scan
    * of exactly the just-written files. A 5th field pins the file's
    * ROW COUNT — with min/max it makes count/min/max aggregates
    * answerable from the manifest alone ([[statsQuery]]); files
    * absent from the grouped scan are empty parquet parts (0 rows,
    * no stats). */
  private def statsLinesFor(s: SparkSession, files: Seq[String],
      statsCol: String): Seq[String] = {
    import org.apache.spark.sql.functions._
    val byFile = s.read.parquet(files: _*)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(statsCol)).cast("string").as("mn"),
        max(col(statsCol)).cast("string").as("mx"),
        count(lit(1)).as("cnt"))
      .collect()
      .map(r => (new Path(r.getString(0)).toUri.getPath,
        (Option(r.getString(1)).getOrElse(""),
          Option(r.getString(2)).getOrElse(""), r.getLong(3))))
      .toMap
    files.map { p =>
      val (mn, mx, cnt) =
        byFile.getOrElse(new Path(p).toUri.getPath, ("", "", 0L))
      s"$p\t$statsCol\t$mn\t$mx\t$cnt"
    }
  }

  /** Raw manifest lines (path [+ tab-separated stats]). Latest
    * resolution goes through the hint; an EXPLICIT id is validated
    * against the listing (time-travel wants the have-list in its
    * error). */
  private def manifestLines(s: SparkSession, root: String,
      id: Option[Long]): Seq[String] = {
    val f = fs(s, root)
    id match {
      case Some(i) =>
        require(f.exists(manifestPath(root, i)),
          s"snapshot $i not found at $root")
        rawManifestLines(f, root, i)
      case None =>
        // "latest" for an unqualified read means the TRUNK head:
        // branch manifests (ref-marked) are visible only through
        // their refs ([[readBranch]]); lines come from the walk's
        // own read, never a second open
        val (k, lines) = trunkHead(s, root)
        require(k >= 0, s"no committed snapshot at $root")
        lines
    }
  }

  private def rawManifestLines(f: FileSystem, root: String,
      id: Long): Seq[String] = {
    val in = f.open(manifestPath(root, id))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The DATA file list a snapshot pins (latest when `id` is None).
    * Deletion-vector sidecar lines (`dv\t<path>`, [[deleteWhere]]) are
    * metadata, not data, and are excluded. */
  def manifestFiles(s: SparkSession, root: String,
      id: Option[Long] = None): Seq[String] =
    manifestLines(s, root, id).map(_.split('\t'))
      .filter(a => !MetaMarkers(a.head)).map(_.head)

  private val DvMarker = "dv"

  /** Branch-lineage marker line (`ref\t<name>`): written into every
    * [[appendToBranch]] manifest so trunk resolution can tell branch
    * manifests from trunk ones. Metadata like DV lines — never a data
    * path. */
  private val RefMarker = "ref"
  private val MetaMarkers = Set(DvMarker, RefMarker)

  /** Deletion-vector sidecar paths of a snapshot (empty when no
    * merge-on-read delete has run). */
  def dvPaths(s: SparkSession, root: String,
      id: Option[Long] = None): Seq[String] =
    manifestLines(s, root, id).map(_.split('\t'))
      .collect { case Array(DvMarker, p) => p }

  /** The files of a snapshot whose `statsCol` range can intersect
    * [lo, hi], resolved from manifest stats alone (no data file is
    * opened to decide). Files without usable stats — a plain
    * [[commit]], a different stats column, or an all-null file — are
    * kept conservatively. Returns (kept files, total files). */
  def pruneFiles(s: SparkSession, root: String, statsCol: String,
      lo: Any, hi: Any, id: Option[Long] = None): (Seq[String], Int) =
    pruneFromLines(s, manifestLines(s, root, id), statsCol, lo, hi)

  private def pruneFromLines(s: SparkSession, lines: Seq[String],
      statsCol: String, lo: Any, hi: Any): (Seq[String], Int) = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    // DV sidecar lines are metadata, not data files — a table that
    // has seen a merge-on-read delete must still prune correctly
    val parsed = lines.map(_.split("\t", -1))
      .filter(a => !MetaMarkers(a.head))
    val stats = parsed.map {
      // 4-field (legacy) and 5-field (row-count-bearing) stats lines
      case a if a.length >= 4 && a(1) == statsCol &&
          a(2).nonEmpty && a(3).nonEmpty =>
        (a(0), a(2), a(3))
      case a => (a(0), null: String, null: String)
    }
    // the column's type, from one footer — so "100" < "99" string
    // traps can't happen: stats compare in the DATA type
    val dt = s.read.parquet(stats.head._1).schema(statsCol).dataType
    val kept = stats.toDF("p", "mn", "mx")
      .filter(col("mn").isNull || col("mx").isNull ||
        !(col("mx").cast(dt) < lit(lo).cast(dt) ||
          col("mn").cast(dt) > lit(hi).cast(dt)))
      .select("p").collect().map(_.getString(0)).toIndexedSeq
    (kept, parsed.length)
  }

  /** Range read THROUGH the stats: scan only the pruned file set,
    * then apply the residual row filter (stats prune at file
    * granularity; rows inside kept files still need the predicate). */
  def readPruned(s: SparkSession, root: String, statsCol: String,
      lo: Any, hi: Any, id: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    // ONE manifest read feeds the prune, the fallback file list, and
    // the DV set (see readSnapshot for why)
    val lines = manifestLines(s, root, id)
    val (kept, _) = pruneFromLines(s, lines, statsCol, lo, hi)
    if (kept.isEmpty)
      s.read.parquet(dataFilesOf(lines).head).filter(lit(false))
    else {
      val data = s.read.parquet(kept: _*)
        .filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
      // merge-on-read deletes apply here too: a pruned range read
      // must not resurrect rows readSnapshot hides
      val dvs = dvsOf(lines)
      if (dvs.isEmpty) data else applyDv(data, s.read.parquet(dvs: _*))
    }
  }

  /** METADATA-ONLY aggregate (the Delta/Iceberg stats-only-query
    * optimization as an explicit verb): answer `SELECT count(*),
    * min(statsCol), max(statsCol)` from the manifest ALONE — count is
    * the sum of the per-file row counts, min/max fold the per-file
    * extremes; NO data file is opened, not even a footer
    * (SnapshotStoreSpec proves it by physically deleting every data
    * file and asking again). At 100 TB this turns the commonest
    * dashboard query from a full-table scan into an O(manifest-lines)
    * driver fold. Requires a [[commitWithStats]] manifest on
    * `statsCol` carrying row counts (the 5-field form) and no
    * deletion vectors (dead positions would overcount; compact
    * first — the same restriction Delta places on stats-served
    * queries over DV tables). Values travel as strings: extremes
    * compare numerically when every value parses as a number, else
    * lexically (correct for ISO-formatted dates/timestamps — the
    * formats Spark's string cast emits). Returns one row
    * (n_rows BIGINT, min_value STRING, max_value STRING). */
  def statsQuery(s: SparkSession, root: String, statsCol: String,
      id: Option[Long] = None): DataFrame = {
    // resolve the snapshot ONCE: the DV check and the stats fold must
    // see the same manifest or a commit landing between them could
    // slip a DV past the overcount guard
    val lines = manifestLines(s, root, id)
    require(dvsOf(lines).isEmpty,
      s"statsQuery at $root: DV-bearing snapshot would overcount; compact first")
    val parsed = lines
      .map(_.split("\t", -1)).filter(a => !MetaMarkers(a.head))
    val rows = parsed.map {
      case a if a.length >= 5 && a(1) == statsCol =>
        (Option(a(2)).filter(_.nonEmpty),
          Option(a(3)).filter(_.nonEmpty), a(4).toLong)
      case a => throw new IllegalStateException(
        s"statsQuery needs a commitWithStats($statsCol) manifest with " +
          s"row counts; file ${a(0)} has none")
    }
    val nRows = rows.map(_._3).sum
    def numeric(v: String) =
      try { new java.math.BigDecimal(v); true }
      catch { case _: NumberFormatException => false }
    val mins = rows.flatMap(_._1)
    val maxs = rows.flatMap(_._2)
    val ord: Ordering[String] =
      if (mins.nonEmpty && (mins ++ maxs).forall(numeric))
        Ordering.by((v: String) => new java.math.BigDecimal(v))
      else Ordering.String
    import s.implicits._
    Seq((nRows, mins.reduceOption((a, b) => ord.min(a, b)),
      maxs.reduceOption((a, b) => ord.max(a, b))))
      .toDF("n_rows", "min_value", "max_value")
  }

  /** S28 — STATS-ONLY QUERY end-to-end: commit orders range-laid-out
    * with key stats + row counts, then answer count/min/max through
    * [[statsQuery]] — the oracle recomputes the same aggregates by
    * scanning the actual table, so a single miscounted or mis-folded
    * file breaks the hash. The layout step (`repartitionByRange`) is
    * what the stats pay for at scale (narrow per-file ranges also
    * serve s14's skipping); the aggregate itself never touches it. */
  def s28StatsOnly(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_totalprice")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"),
      s"graft_s28${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    commitWithStats(base.repartitionByRange(8, col("o_orderkey")),
      root, "o_orderkey")
    statsQuery(s, root, "o_orderkey")
      .select(col("n_rows"),
        col("min_value").cast("bigint").as("min_key"),
        col("max_value").cast("bigint").as("max_key"))
  }

  /** Read the latest snapshot — exactly the manifest's files, never a
    * directory listing. */
  def read(s: SparkSession, root: String): DataFrame =
    readSnapshot(s, root, None)

  /** Time travel: read snapshot `id` (or latest). When the snapshot
    * carries a deletion vector ([[deleteWhere]]), deleted positions
    * are filtered out merge-on-read: every row is tagged with its
    * (file, row-position) identity from the parquet reader's hidden
    * `_metadata` column — no data was rewritten, so position IS
    * identity — and a broadcast left-anti join against the (small)
    * DV sidecar drops the dead rows. The join keys on `file_name`,
    * not the full path: Spark part names embed the write job's UUID,
    * so names are unique table-wide and sidestep scheme/URI
    * normalization between `_metadata.file_path` and manifest paths. */
  def readSnapshot(s: SparkSession, root: String,
      id: Option[Long]): DataFrame = {
    // ONE manifest read: files and DVs must come from the same
    // snapshot, or a compaction landing between two reads would
    // pair old files with a newer DV set (resurrected deletes)
    val lines = manifestLines(s, root, id)
    val data = s.read.parquet(dataFilesOf(lines): _*)
    val dvs = dvsOf(lines)
    if (dvs.isEmpty) data
    else applyDv(data, s.read.parquet(dvs: _*))
  }

  /** Filter out DV-listed (file, position) rows: tag each row with
    * its parquet identity from `_metadata`, broadcast-anti-join the
    * sidecar (deletes are small relative to the table — that is the
    * regime merge-on-read exists for), drop the tags. */
  private def applyDv(data: DataFrame, dv: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    data
      .withColumn("__dv_file", col("_metadata.file_name"))
      .withColumn("__dv_pos", col("_metadata.row_index"))
      .join(broadcast(dv),
        col("__dv_file") === col("dv_file") &&
          col("__dv_pos") === col("dv_pos"),
        "left_anti")
      .drop("__dv_file", "__dv_pos")
  }

  /** Merge-on-read DELETE — the deletion-vector half of the lakehouse
    * write surface (the public Delta DV / Iceberg position-delete
    * idea), beside the copy-on-write path ([[MergeInto]] rewrites
    * every touched file). No data file is touched: rows matching
    * `cond` in the CURRENT snapshot are recorded as (file name, row
    * position) pairs in a parquet sidecar, and the new manifest pins
    * the SAME data files plus the sidecar. Cost is O(matched rows)
    * write + one manifest commit — at 100 TB a DELETE of 0.01% of
    * rows costs 0.01%, where copy-on-write pays for every file a
    * matching row lands in. Readers pay a broadcast anti-join until
    * [[compact]] (or any rewrite) materializes the deletes away.
    * Sidecars merge cumulatively: each delete writes one sidecar
    * holding ALL dead positions, so reads join one DV regardless of
    * delete count. Returns the new snapshot id (latest id unchanged
    * when nothing matched — deletes are idempotent). */
  def deleteWhere(s: SparkSession, root: String,
      cond: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions._
    // resolve the snapshot ONCE: files, data lines, and DVs must all
    // come from the same manifest, or a commit landing mid-read
    // desynchronizes the OCC sets from the snapshot the dead
    // positions were computed against (silent lost delete)
    val (latest0, lines0) = trunkHead(s, root)
    require(latest0 >= 0, s"no committed snapshot at $root")
    val dataLines = lines0
      .filterNot(l => MetaMarkers(l.split('\t').head))
    val files = dataFilesOf(lines0)
    val dvs = dvsOf(lines0)
    val tagged = s.read.parquet(files: _*)
      .withColumn("dv_file", col("_metadata.file_name"))
      .withColumn("dv_pos", col("_metadata.row_index"))
    // only LIVE rows can die: apply the existing DV before matching,
    // so re-running the same predicate finds nothing (idempotence)
    val live =
      if (dvs.isEmpty) tagged
      else tagged.join(
        broadcast(s.read.parquet(dvs: _*)
          .withColumnRenamed("dv_file", "old_file")
          .withColumnRenamed("dv_pos", "old_pos")),
        col("dv_file") === col("old_file") &&
          col("dv_pos") === col("old_pos"),
        "left_anti")
    val newDead = live.filter(cond).select("dv_file", "dv_pos")
    if (newDead.isEmpty) return latest0
    val merged =
      if (dvs.isEmpty) newDead
      else s.read.parquet(dvs: _*).unionByName(newDead)
    val f = fs(s, root)
    val dvDir = new Path(root, s"data/dv-${UUID.randomUUID()}")
    merged.coalesce(1).write.parquet(dvDir.toString)
    require(f.exists(dvDir), s"DV write failed at $dvDir")
    // OCC rewrite: the dead positions were computed against `files`
    // and the merged sidecar against `dvs` — both must still be
    // pinned at commit time (a concurrent compaction invalidates the
    // positions; a concurrent delete's sidecar would be dropped by
    // ours). Concurrent APPENDS rebase in conflict-free: appended
    // rows have no dead positions yet.
    commitRewrite(s, root,
      required = dataLines.map(lineKey).toSet,
      removed = dvs.map(p => s"$DvMarker\t$p").toSet,
      added = Seq(s"$DvMarker\t$dvDir"), maxRetries = 10)
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

  /** Full-fidelity CDF changes — [[keyedChanges]] emits only the NEW
    * side of an update, which is enough to patch a keyed mirror but
    * NOT to maintain an aggregate: subtracting an update's old
    * contribution needs its PREIMAGE. This variant speaks the Delta
    * CDF dialect exactly — an update emits TWO rows,
    * `update_preimage` (old values) and `update_postimage` (new
    * values) — so any downstream consumer can treat every change as
    * a signed row: preimage/delete retract, postimage/insert assert.
    * Same single full-outer join; the two-row fan-out is a row-local
    * explode over a fate array (no extra shuffle). */
  def cdfChanges(from: DataFrame, to: DataFrame, key: String)
      : DataFrame = {
    import org.apache.spark.sql.functions._
    val attrs = from.columns.filterNot(_ == key)
    val o = from.alias("o")
    val n = to.alias("n")
    val differs = attrs.map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    def img(side: String, fate: String) =
      struct(lit(fate).as("change_type") +:
        col(s"$side.$key").as(key) +:
        attrs.map(c => col(s"$side.$c").as(c)): _*)
    // unchanged rows carry a sentinel fate and are dropped after the
    // explode — `array()` alone would be untyped
    val fates = when(col(s"o.$key").isNull, array(img("n", "insert")))
      .when(col(s"n.$key").isNull, array(img("o", "delete")))
      .when(differs,
        array(img("o", "update_preimage"), img("n", "update_postimage")))
      .otherwise(array(img("o", "unchanged")))
    o.join(n, col(s"o.$key") === col(s"n.$key"), "full_outer")
      .select(explode(fates).as("ch"))
      .filter(col("ch.change_type") =!= "unchanged")
      .select("ch.*")
  }

  /** The mergeable state of `groupBy(groupCol).agg(count, sum)` —
    * the sum held in EXACT decimal so later retractions cancel
    * bit-exactly (a double running sum would drift per churn batch). */
  def aggState(df: DataFrame, groupCol: String, sumCol: String)
      : DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(groupCol).agg(count(lit(1)).as("n_rows"),
      sum(graft.ops.Det.d2(col(sumCol))).as("s_dec"))
  }

  /** INCREMENTAL VIEW MAINTENANCE: fold a CDF change batch into an
    * [[aggState]] instead of recomputing it. Every change row is a
    * signed contribution (+1 for insert/update_postimage, −1 for
    * delete/update_preimage); the per-group delta is one aggregation
    * over the CHANGES — work scales with the churn, not the table —
    * and merges into the state by a keyed outer join. Group-moving
    * updates need no special case: the preimage retracts from the
    * old group, the postimage asserts into the new one. Groups whose
    * count reaches zero disappear (the recompute would not list
    * them). At 100 TB this is the nightly-dashboard pattern: the
    * 10⁸-group state updates from a 10⁵-row churn in seconds. */
  def applyCdfDelta(state: DataFrame, changes: DataFrame,
      groupCol: String, sumCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sign = when(
      col("change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val delta = changes.groupBy(groupCol).agg(
      sum(sign).as("d_n"),
      sum(sign * graft.ops.Det.d2(col(sumCol))).as("d_s"))
    state.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("d_n"), lit(0L))).as("n_rows"),
        (coalesce(col("s_dec"), lit(0)) +
          coalesce(col("d_s"), lit(0))).as("s_dec"))
      .filter(col("n_rows") > 0)
  }

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
        .withColumn("c_custkey", col("c_custkey") + DimPlantOffset))
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"), s"graft_s12${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    commit(base, root)
    commit(v1, root)
    changesBetween(s, root, 0L, 1L, "c_custkey")
  }

  /** S14 — data skipping end-to-end: orders RANGE-CLUSTERED on the
    * order key into 8 files (the layout that makes min-max stats
    * selective), committed with stats, then a narrow key-range read
    * resolved through the manifest. The pruning itself (≤2 of 8 files
    * survive [[pruneFiles]], zero data files opened to decide) is
    * pinned in SnapshotStoreSpec; the oracle checks the layer is
    * answer-invisible — same rows as a plain filter over the base
    * table. At 100 TB this is the difference between a point query
    * touching one file vs listing-and-scanning the table. */
  def s14SnapshotSkipping(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"), s"graft_s14${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    commitWithStats(base.repartitionByRange(8, col("o_orderkey")),
      root, "o_orderkey")
    readPruned(s, root, "o_orderkey", 1000L, 5000L)
  }

  /** S15 — the maintained aggregate itself, gated against a FULL
    * RECOMPUTE in the oracle: per-segment (count, exact-decimal
    * balance sum) over a customer churn that deletes (every 97th ≡
    * 3), bumps balances (every 10th), MOVES GROUPS (every 50th ≡ 7
    * re-segmented to MACHINERY — the case that breaks new-values-only
    * CDC consumers), and inserts (every 100th at +3M). The Spark side
    * never aggregates the churned table: it folds [[cdfChanges]] into
    * the base state via [[applyCdfDelta]]; hash-matching the oracle's
    * recompute proves retraction algebra + exact decimal cancellation
    * end-to-end. */
  def s15IncrementalMv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.customer(s, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val v1 = base.filter(col("c_custkey") % 97 =!= 3)
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 50 === 7, "MACHINERY")
          .otherwise(col("c_mktsegment")))
      .withColumn("c_acctbal",
        when(col("c_custkey") % 10 === 0, col("c_acctbal") + 250.0)
          .otherwise(col("c_acctbal")))
      .union(base.filter(col("c_custkey") % 100 === 0)
        .withColumn("c_custkey", col("c_custkey") + DimPlantOffset))
    val mv0 = aggState(base, "c_mktsegment", "c_acctbal")
    val mv1 = applyCdfDelta(mv0,
      cdfChanges(base, v1, "c_custkey"), "c_mktsegment", "c_acctbal")
    mv1.select(col("c_mktsegment"), col("n_rows"),
      col("s_dec").cast("double").as("sum_bal"))
  }

  /** OPTIMIZE-style small-file compaction (the Delta OPTIMIZE /
    * Iceberg rewrite_data_files maintenance op): bin the latest
    * snapshot's SMALL files (< targetBytes/2) into ~targetBytes
    * outputs and commit the result as the next snapshot. Files at or
    * above the threshold are carried over BY REFERENCE — never read,
    * never rewritten — so compaction cost scales with the small-file
    * mass, not the table (at 100 TB the small-file tail of a
    * streaming ingest is gigabytes; rewriting healthy files would be
    * the whole table). The rewrite is one round-robin shuffle of the
    * small-file rows into ceil(smallBytes/targetBytes) partitions.
    * Old snapshots stay readable (time travel intact; `vacuum`
    * reclaims them later). Plain manifests only — a stats manifest
    * (commitWithStats) would need its per-file min/max recomputed for
    * the rewritten files. Returns the new snapshot id (or the latest
    * id unchanged when <2 small files exist — nothing to compact). */
  def compact(s: SparkSession, root: String, targetBytes: Long): Long = {
    import org.apache.spark.sql.functions._
    val f = fs(s, root)
    // keep whole manifest LINES for carried files: on a
    // commitWithStats table the 'path\tcol\tmin\tmax' suffix must
    // survive compaction for the untouched files, or data skipping
    // silently dies after the first OPTIMIZE (rewritten files get
    // plain lines — their stats would need recomputation)
    // one snapshot resolution for lines AND DVs (no mid-read commit
    // can desynchronize the OCC sets from the rewrite's inputs)
    val (snap0, lines0) = trunkHead(s, root)
    require(snap0 >= 0, s"no committed snapshot at $root")
    val dataLines = lines0
      .filter(l => !MetaMarkers(l.split('\t').head))
    val sized = dataLines.map { line =>
      val p = line.split('\t').head
      (line, p, f.getFileStatus(new Path(p)).getLen)
    }
    val (small, keep) = sized.partition(_._3 < targetBytes / 2)
    if (small.length < 2) return snap0
    val totalSmall = small.map(_._3).sum
    val nOut = math.max(1,
      math.ceil(totalSmall.toDouble / targetBytes).toInt)
    val dvs = dvsOf(lines0)
    val smallRaw = s.read.parquet(small.map(_._2): _*)
    // a rewrite MATERIALIZES deletes: apply the DV to the rewritten
    // rows (else compaction would resurrect them) and carry forward
    // only the positions of files kept by reference
    val df = (if (dvs.isEmpty) smallRaw
              else applyDv(smallRaw, s.read.parquet(dvs: _*)))
      .repartition(nOut)
    val (_, newFiles) = writeSnapshotData(df, root)
    val dvCarry: Seq[String] =
      if (dvs.isEmpty) Seq.empty
      else {
        val keepNames = keep.map(p => new Path(p._2).getName)
        val rows = s.read.parquet(dvs: _*)
          .filter(col("dv_file").isin(keepNames: _*))
        if (rows.isEmpty) Seq.empty
        else {
          val dvDir = new Path(root, s"data/dv-${UUID.randomUUID()}")
          rows.coalesce(1).write.parquet(dvDir.toString)
          Seq(s"$DvMarker\t$dvDir")
        }
      }
    // OCC rewrite: drop the small files (rewritten) and ALL old DV
    // sidecars (materialized into the rewrite / re-filtered to the
    // kept files); the kept data files must still be pinned at
    // commit time (their DV carry-over was filtered against them).
    // Kept lines are carried from the CURRENT base inside the loop —
    // concurrent appends land untouched, a concurrent rewrite of any
    // file this compaction derived from aborts with
    // ConcurrentModificationException.
    commitRewrite(s, root,
      required = keep.map(k => lineKey(k._1)).toSet,
      removed = small.map(k => lineKey(k._1)).toSet ++
        dvs.map(p => s"$DvMarker\t$p"),
      added = newFiles.sorted ++ dvCarry, maxRetries = 10)
    // (kept lines are full manifest LINES - stats suffixes ride along)
  }

  /** OPTIMIZE ... ZORDER BY (the Delta verb): rewrite the WHOLE
    * table z-clustered on (cx, cy) and re-stats'd on `statsCol`,
    * committed through the OCC rewrite path — concurrent appends
    * rebase in untouched, a conflicting rewrite aborts. Unlike
    * [[compact]] (which bins only undersized files and carries the
    * rest by reference), a recluster derives from EVERY data file:
    * all data lines are removed and replaced, and DV sidecars are
    * materialized into the rewrite. The payoff is what s8/s14
    * demonstrate separately, composed: each output file owns a
    * z-contiguous rectangle of the two dimensions, so the refreshed
    * min/max manifest stats prune range reads on EITHER column —
    * a random layout's stats span everything and prune nothing. */
  def optimizeZorder(s: SparkSession, root: String,
      cx: String, cy: String, numFiles: Int, statsCol: String): Long = {
    // one snapshot resolution for lines AND DVs (see compact)
    val (snap0, lines0) = trunkHead(s, root)
    require(snap0 >= 0, s"no committed snapshot at $root")
    val dataLines = lines0
      .filter(l => !MetaMarkers(l.split('\t').head))
    val files = dataLines.map(_.split('\t').head)
    val dvs = dvsOf(lines0)
    val raw = s.read.parquet(files: _*)
    val clustered = ZOrder.zCluster(
      if (dvs.isEmpty) raw else applyDv(raw, s.read.parquet(dvs: _*)),
      cx, cy, numFiles)
    val (_, newFiles) = writeSnapshotData(clustered, root)
    commitRewrite(s, root,
      required = dataLines.map(lineKey).toSet,
      removed = dataLines.map(lineKey).toSet ++
        dvs.map(p => s"$DvMarker\t$p"),
      added = statsLinesFor(s, newFiles, statsCol), maxRetries = 10)
  }

  /** S32 — OPTIMIZE ZORDER end-to-end: commit orders in a
    * deliberately scattered layout (every file spans the whole key
    * space — manifest stats would prune NOTHING), recluster on
    * (o_custkey, o_totalprice), then answer a narrow o_custkey band
    * through the stats-pruned reader. The oracle recomputes the band
    * from the raw table, so a recluster that lost, duplicated, or
    * resurrected one row breaks the hash; SnapshotStoreSpec asserts
    * the pruning itself (kept files ≪ total) and history staying
    * time-travelable. Band bounds derive from max(o_custkey) so the
    * fixture holds at any SF. */
  def s32OptimizeZorder(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val orders = graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"),
      s"graft_s32${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    commit(orders.repartition(16), root)
    optimizeZorder(s, root, "o_custkey", "o_totalprice",
      numFiles = 8, statsCol = "o_custkey")
    val maxK = orders.agg(max("o_custkey")).head().getLong(0)
    readPruned(s, root, "o_custkey", maxK / 4, maxK / 2)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).cast("bigint").as("sum_keys"))
  }

  /** SHALLOW CLONE (the Delta CLONE verb): create table `dst` whose
    * first snapshot REFERENCES `src`'s current trunk data files —
    * zero data copied, O(manifest) at any table size (the dev/test
    * copy of a 100-TB table costs one small file). The clone is
    * independent forward: appends/rewrites on either side land in
    * their own manifests and never touch the shared files (all data
    * files are immutable; a rewrite writes NEW files). Caveat, same
    * as Delta's: a VACUUM on the SOURCE can reclaim files the clone
    * still references — production either deep-clones or tracks
    * cross-table references; this store documents the limitation. */
  def cloneTable(s: SparkSession, src: String, dst: String): Long = {
    val lines = manifestLines(s, src, None)
      .filterNot(_.startsWith(RefMarker + "\t"))
    commitManifest(s, dst, lines, maxRetries = 10)
  }

  /** S33 — shallow clone end-to-end: clone the committed orders
    * table, append a planted slice to the CLONE only, and read both.
    * The oracle pins (src unchanged) + (clone = src + plant) in one
    * union — a clone that copied nothing must still read everything,
    * and a clone append that leaked into the source breaks the src
    * half. SnapshotStoreSpec additionally proves the zero-copy claim
    * (the clone's data directory holds only its OWN append) and
    * rewrite independence. */
  def s33ShallowClone(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(s, dir).select("o_orderkey")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"),
      s"graft_s33${tag}_${s.sparkContext.applicationId}").toString
    Scratch.fresh(s, new Path(root))
    val srcRoot = s"$root/src"
    val dstRoot = s"$root/clone"
    commit(base, srcRoot)
    cloneTable(s, srcRoot, dstRoot)
    val strideV = base.agg(max("o_orderkey")).head().getLong(0) + 1L
    appendCommit(base.filter(col("o_orderkey") % 10 === 0)
      .select((col("o_orderkey") + strideV).as("o_orderkey")), dstRoot)
    read(s, srcRoot).select(lit("src").as("side"), col("o_orderkey"))
      .unionByName(read(s, dstRoot)
        .select(lit("clone").as("side"), col("o_orderkey")))
      .groupBy("side")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).cast("bigint").as("sum_keys"))
  }

  /** S20 — compaction end-to-end: commit orders in a deliberately
    * fragmented 64-file layout (a streaming ingest's small-file
    * debt), OPTIMIZE it, and read the table back through the new
    * manifest. The oracle gates ANSWER INVISIBILITY — the compacted
    * table is row-for-row the base table; the file-count collapse,
    * the large-file carry-over-by-reference, and pre-compaction
    * time travel are pinned in SnapshotStoreSpec. */
  def s20Compaction(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"), s"graft_s20${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    commit(base.repartition(64), root)
    compact(s, root, targetBytes = 1L << 20)
    read(s, root)
  }

  /** S21 — merge-on-read DELETE end-to-end: commit orders, run two
    * cumulative [[deleteWhere]] passes (a key-residue slice, then a
    * value-range slice), and read the survivors back through the
    * DV-applying reader. No data file is rewritten at any point
    * (SnapshotStoreSpec pins names+mtimes identical across deletes,
    * time travel to the pre-delete rows, idempotent re-delete, and
    * delete-then-compact materialization); the oracle replays both
    * predicates against the base table. */
  def s21DeleteVectors(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"), s"graft_s21${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    commit(base.repartition(8), root)
    deleteWhere(s, root, col("o_orderkey") % 7 === 3)
    deleteWhere(s, root, col("o_totalprice") > 400000.0)
    read(s, root)
  }

  /** APPEND commit: land `df` as new data files and pin them in a new
    * manifest TOGETHER WITH the previous snapshot's lines verbatim —
    * carried data files keep their stats metadata, DV sidecars stay
    * attached, nothing is rewritten. Cost is O(new data) regardless of
    * table size (the full-[[commit]] path rewrites the table). The
    * appended frame may carry ADDITIONAL columns — see
    * [[readEvolved]] for how mixed-schema snapshots read back. */
  def appendCommit(df: DataFrame, root: String): Long = {
    enforceConstraints(df, root)
    val (s, files) = writeSnapshotData(df, root)
    // rebase, don't pin: the base lines are resolved INSIDE the
    // commit loop, so an append that loses the id race to another
    // appender retries on top of the winner's manifest instead of
    // silently dropping it (appends are conflict-free by
    // construction — new immutable files, nothing removed)
    require(latestId(s, root) >= 0, s"no committed snapshot at $root")
    commitRebase(s, root, base => base() ++ files, 10)
  }

  // ---- branches (Iceberg-style named refs) ----------------------

  private def refPath(root: String, name: String) = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"bad branch name: $name")
    new Path(new Path(root, "refs"), name)
  }

  /** Head snapshot id of branch `name`, if it exists. */
  def branchHead(s: SparkSession, root: String, name: String)
      : Option[Long] = {
    val f = fs(s, root)
    val p = refPath(root, name)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Create branch `name` at snapshot `fromId` — a named POINTER into
    * the snapshot log (the Iceberg refs model). Manifests are
    * self-contained file lists, so a branch costs one ~20-byte ref
    * file: no data, no manifest copy, O(1) at any table size.
    * Rename-if-absent makes creation atomic; an existing branch is an
    * error (use [[fastForward]] to move one). */
  def createBranch(s: SparkSession, root: String, name: String,
      fromId: Long): Unit = {
    require(snapshots(s, root).contains(fromId),
      s"snapshot $fromId not found at $root")
    val f = fs(s, root)
    f.mkdirs(new Path(root, "refs"))
    val tmp = new Path(new Path(root, "refs"), s".tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(s"$fromId\n".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!renameIfAbsent(f, tmp, refPath(root, name))) {
      f.delete(tmp, false)
      throw new IllegalStateException(s"branch $name already exists")
    }
  }

  /** Move a ref (same tmp-write + rename; the delete/rename pair is
    * last-writer-wins, so the store's concurrency contract is ONE
    * writer per branch — commits to DIFFERENT branches stay safe
    * because manifest ids are still claimed through the global
    * rename-if-absent race). */
  private def updateBranch(s: SparkSession, root: String, name: String,
      toId: Long): Unit = {
    val f = fs(s, root)
    val tmp = new Path(new Path(root, "refs"), s".tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(s"$toId\n".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    f.delete(refPath(root, name), false)
    if (!f.rename(tmp, refPath(root, name)))
      throw new IllegalStateException(s"lost ref update race on $name")
  }

  /** Append `df` on top of the BRANCH head (not the global latest)
    * and advance the branch. The new manifest still claims the next
    * GLOBAL id — one monotonic log across all branches, like
    * Iceberg's sequence numbers — but its file list extends the
    * branch lineage, so other branches never see these rows. */
  def appendToBranch(df: DataFrame, root: String, name: String): Long = {
    enforceConstraints(df, root)
    val s = df.sparkSession
    val head = branchHead(s, root, name).getOrElse(
      throw new IllegalArgumentException(s"no branch $name at $root"))
    val (_, files) = writeSnapshotData(df, root)
    // the manifest carries a ref marker so trunk resolution can tell
    // branch lineage from trunk lineage (one marker, this branch's --
    // the head's own marker is stripped, not duplicated)
    val headLines = manifestLines(s, root, Some(head))
      .filterNot(_.startsWith(RefMarker + "\t"))
    val id = commitManifest(s, root,
      headLines ++ files :+ s"$RefMarker\t$name", 10)
    updateBranch(s, root, name, id)
    id
  }

  /** Read the table as branch `name` sees it. */
  def readBranch(s: SparkSession, root: String, name: String): DataFrame =
    readSnapshot(s, root, branchHead(s, root, name).map(Some(_)).getOrElse(
      throw new IllegalArgumentException(s"no branch $name at $root")))

  /** Fast-forward `into` to `from`'s head (the Iceberg
    * `fast_forward` procedure): metadata-only publish of a validated
    * branch. The caller asserts ancestry (`into`'s head is part of
    * `from`'s lineage) — the manifest log stores no parent links, so
    * the store cannot check it; misuse makes `into` jump lineages,
    * exactly like a forced ref move in git. */
  def fastForward(s: SparkSession, root: String, into: String,
      from: String): Long = {
    val toId = branchHead(s, root, from).getOrElse(
      throw new IllegalArgumentException(s"no branch $from at $root"))
    // Iceberg's fast_forward requires an existing target ref; without
    // this check a typo'd `into` would silently MINT a new branch
    // (updateBranch's delete-then-rename tolerates a missing ref)
    // instead of failing the publish.
    require(branchHead(s, root, into).isDefined,
      s"no branch $into at $root — fast-forward cannot create refs")
    updateBranch(s, root, into, toId)
    toId
  }

  /** Plant offsets for the s26 branch fixture (distinct from the
    * s12/s15 churn offsets so no fixture can alias another even if
    * scratch roots ever collide). */
  private[sources] val BranchExpOffset = 1L << 42
  private[sources] val BranchMainOffset = 1L << 43

  /** S26 — BRANCHES end-to-end: commit the base table (v0), fork
    * `exp` and `main` refs at v0, land a different deterministic
    * plant on each (every 5th key, offset-shifted, on exp; every 7th
    * on main), then fast-forward a `release` ref to the validated
    * exp head. Each branch read must see base + ITS OWN plant only —
    * write isolation across refs over one shared snapshot log — and
    * release must equal exp byte-for-byte. The per-branch counts and
    * exact bigint key-sums form the closed-form oracle; the
    * WAP-protocol details (ref atomicity, global id claims,
    * time-travel through branch commits) are SnapshotStoreSpec's.
    * This is the write-audit-publish pattern: produce on a branch,
    * gate it (s16 expectations), publish by fast-forward — at 100 TB
    * the publish step moves ~20 bytes. */
  def s26Branches(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(s, dir).select("o_orderkey")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"),
      s"graft_s26${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    val v0 = commit(base, root)
    createBranch(s, root, "exp", v0)
    createBranch(s, root, "main", v0)
    appendToBranch(base.filter(col("o_orderkey") % 5 === 0)
      .select((col("o_orderkey") + BranchExpOffset).as("o_orderkey")),
      root, "exp")
    appendToBranch(base.filter(col("o_orderkey") % 7 === 0)
      .select((col("o_orderkey") + BranchMainOffset).as("o_orderkey")),
      root, "main")
    createBranch(s, root, "release", v0)
    fastForward(s, root, "release", "exp")
    Seq("exp", "main", "release").map { b =>
      readBranch(s, root, b)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).cast("bigint").as("sum_keys"))
        .select(lit(b).as("branch"), col("n_rows"), col("sum_keys"))
    }.reduce(_ unionByName _)
  }

  /** S27 — CONCURRENT APPENDERS end-to-end: commit a base snapshot,
    * then land 6 disjoint planted slices through [[appendCommit]]
    * from 6 RACING driver threads (each thread writes its own data
    * files, then fights the same rename-if-absent commit race). The
    * OCC rebase loop is what makes this correct: every loser re-reads
    * the winner's manifest and retries on top of it, so all 6 slices
    * — and the base — must be present in the final read regardless of
    * interleaving. A pinned-lines commit loop drops appends under
    * this exact race (the lost-update anomaly); the closed-form
    * oracle (total count + exact key-sum of base ∪ all slices) fails
    * loudly if even one row went missing. This is the multi-writer
    * story a 100-TB lakehouse table needs: concurrent ingest jobs
    * appending to one table with no coordinator beyond the atomic
    * rename. */
  def s27ConcurrentAppends(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(s, dir).select("o_orderkey")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"),
      s"graft_s27${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    commit(base, root)
    val nWriters = 6
    // slice w = keys ≡ w (mod 6), shifted by stride·(w+1) where
    // stride = max(key)+1 — scale-RELATIVE, so slices stay disjoint
    // from the base and each other at any SF while the key-sum stays
    // ≤ ~7·stride·n (a fixed 2^44-style offset overflowed the bigint
    // sum at sf1.0: 1.5M rows × 2^44 > Long.MaxValue); a writer
    // failure must surface as an error, not a silently missing slice
    val strideV = base.agg(max("o_orderkey")).head().getLong(0) + 1L
    val errs =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until nWriters).map { w =>
      new Thread(() => {
        try {
          val slice = base.filter(col("o_orderkey") % nWriters === w)
            .select((col("o_orderkey") +
              lit(strideV) * (w + 1L)).as("o_orderkey"))
          appendCommit(slice, root)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    if (!errs.isEmpty) throw new IllegalStateException(
      s"s27 appender failed", errs.peek())
    read(s, root).agg(count(lit(1)).as("n_rows"),
      sum(col("o_orderkey")).cast("bigint").as("sum_keys"))
  }

  /** Broadcast the build side when its MANIFEST row count is under
    * this many rows (a stand-in for a bytes budget; the point is the
    * decision input, not the dial's value). */
  private[sources] val BroadcastRowThreshold = 100000L

  /** S31 — stats-driven join strategy: the physical-plan decision
    * CBO machinery exists FOR, fed from snapshot-store metadata. Both
    * sides live in snapshot tables whose manifests carry row counts
    * (s28's 5-field stats form); the join picks broadcast-vs-shuffle
    * from [[statsQuery]]'s EXACT metadata count — no data file is
    * opened to decide, no file-size heuristic. That matters at scale
    * because Spark's default sizeInBytes estimate (compressed file
    * bytes × factor) is what autoBroadcastJoinThreshold sees, and it
    * wildly misjudges post-filter cardinality and wide-row tables;
    * exact manifest counts are the Delta/Iceberg answer
    * (StatsPlanningSpec shows the same via ANALYZE + CBO for catalog
    * tables). Below [[BroadcastRowThreshold]] rows the small side is
    * planned as a broadcast build (no shuffle of the big side — the
    * 100-TB fact never moves); above it the hint is withheld and the
    * planner keeps its shuffle join. The RESULT is decision-invariant
    * — the oracle pins it; SnapshotStoreSpec pins the plan shape
    * both ways. */
  def s31StatsJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val base = new Path(
      sys.props("java.io.tmpdir"),
      s"graft_s31${tag}_${s.sparkContext.applicationId}").toString
    Scratch.fresh(s, new Path(base))
    val custRoot = s"$base/customer"
    val ordRoot = s"$base/orders"
    commitWithStats(graft.Tables.customer(s, dir)
      .select("c_custkey", "c_mktsegment"), custRoot, "c_custkey")
    commitWithStats(graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey"), ordRoot, "o_custkey")
    statsDrivenJoin(s, custRoot, ordRoot)
  }

  /** The s31 join body over two already-committed stats-bearing
    * tables — split out so the spec can pin the plan on its own
    * fixtures. Decides from metadata, then joins the DATA. */
  private[sources] def statsDrivenJoin(s: SparkSession,
      custRoot: String, ordRoot: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val custRows = statsQuery(s, custRoot, "c_custkey")
      .head().getLong(0)
    val cust = read(s, custRoot)
    val build = if (custRows < BroadcastRowThreshold) broadcast(cust)
                else cust
    read(s, ordRoot)
      .join(build, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_orderkey")).cast("bigint").as("sum_keys"))
  }

  /** NDV-bearing manifest commit: the s28 5-field stats line plus a
    * 6th field carrying the file's bottom-k distinct-hash sketch of
    * `statsCol` (the x52 KMV, comma-joined — ~2 KiB per file at
    * k=256), the Iceberg-puffin/theta pattern. What row counts can't
    * answer and NDV can: JOIN OUTPUT cardinality — the CBO uniform
    * rule |A⋈B| ≈ nA·nB / max(ndv_A, ndv_B) needs per-column
    * distinct counts, and at 100 TB the only affordable way to have
    * them at plan time is mergeable per-file sketches persisted at
    * WRITE time (bottom-k-of-union over manifest lines — no data
    * file ever reopened; exact-count ANALYZE is another full scan).
    * The hash is the x52 AVALANCHE hash (xxhash64 — the estimator
    * needs uniformity on the full domain; the Knuth mix maps
    * small/sequential key sets into a prefix and overestimates, the
    * x52 lesson), computed over NON-NULL rows only (xxhash64 maps
    * NULL to its seed, which would smuggle one phantom distinct into
    * the estimate; COUNT(DISTINCT) and Iceberg NDV both exclude
    * nulls, and the CBO join formula assumes that semantics).
    * Under-full sketches retain every distinct hash, so
    * their size is the exact distinct count modulo hash collisions —
    * and on the FIXED 199-cohort gate domain collision-freeness is a
    * deterministic, SF-independent fact the s34 oracle's hash match
    * verifies once and forever (a collision would read 198 vs the
    * oracle's COUNT(DISTINCT) 199 at every run). */
  def commitWithNdv(df: DataFrame, root: String, statsCol: String,
      maxRetries: Int = 10): Long = {
    enforceConstraints(df, root)
    val (s, files) = writeSnapshotData(df, root)
    commitManifest(s, root, ndvLinesFor(s, files, statsCol),
      maxRetries)
  }

  private def ndvLinesFor(s: SparkSession, files: Seq[String],
      statsCol: String): Seq[String] = {
    import org.apache.spark.sql.functions._
    import graft.ops.KmvSketch
    val byFile = s.read.parquet(files: _*)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(statsCol)).cast("string").as("mn"),
        max(col(statsCol)).cast("string").as("mx"),
        count(lit(1)).as("cnt"),
        // NULL gate: xxhash64 maps NULL to its seed, which would add
        // one phantom distinct and break the COUNT(DISTINCT)/Iceberg
        // NDV semantics the CBO formula assumes; the -1 sentinel is
        // skipped by the aggregator (the frame can't be pre-filtered
        // because cnt must count ALL rows)
        KmvSketch.kmv(KmvSketch.K)(
          when(col(statsCol).isNotNull,
            KmvSketch.avalancheExpr(col(statsCol)))
            .otherwise(lit(-1L))).as("sk"))
      .collect()
      .map(r => (new Path(r.getString(0)).toUri.getPath,
        (Option(r.getString(1)).getOrElse(""),
          Option(r.getString(2)).getOrElse(""), r.getLong(3),
          r.getSeq[Long](4).mkString(","))))
      .toMap
    files.map { p =>
      val (mn, mx, cnt, sk) = byFile
        .getOrElse(new Path(p).toUri.getPath, ("", "", 0L, ""))
      s"$p\t$statsCol\t$mn\t$mx\t$cnt\t$sk"
    }
  }

  /** (row count, NDV estimate) for `statsCol` from the MANIFEST
    * alone — per-file sketches merged by bottom-k-of-union, zero
    * data files opened (NdvStatsSpec pins that by answering after
    * the data files are deleted). Under-full merged sketch ⇒ the
    * estimate is the exact distinct count. */
  def ndvQuery(s: SparkSession, root: String, statsCol: String,
      id: Option[Long] = None): (Long, Double) = {
    import graft.ops.KmvSketch
    val parsed = manifestLines(s, root, id)
      .map(_.split("\t", -1)).filter(a => !MetaMarkers(a.head))
    val perFile = parsed.map {
      case a if a.length >= 6 && a(1) == statsCol =>
        (a(4).toLong,
          if (a(5).isEmpty) Seq.empty[Long]
          else a(5).split(',').map(_.toLong).toSeq)
      case a => throw new IllegalStateException(
        s"ndvQuery needs a commitWithNdv($statsCol) manifest; " +
          s"file ${a(0)} lacks a sketch field")
    }
    val merged = perFile.map(_._2)
      .foldLeft(Seq.empty[Long])(KmvSketch.unionSketch(_, _, KmvSketch.K))
    (perFile.map(_._1).sum, KmvSketch.distinctEst(merged, KmvSketch.K))
  }

  /** S34 — NDV-STATS JOIN CARDINALITY estimation: the planning
    * decision s31's row counts cannot make. Both join sides commit
    * through [[commitWithNdv]] on a 199-cohort join key (bounded
    * under the sketch's k ⇒ every NDV is exact — the x52b
    * discipline); the CBO uniform-key estimate nA·nB/max(dA,dB)
    * computes from MANIFEST METADATA ONLY, and the row carries the
    * true join cardinality beside it (computed as
    * aggregate-then-multiply — Σ_key nA(key)·nB(key) — never
    * materializing the joined rows). At 100 TB the estimate is what
    * an engine consults to refuse/replan an exploding join BEFORE
    * shuffling a fact table; the truth column is this gate's
    * verification, not part of the production read. */
  def s34NdvJoinEstimate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val base = new Path(
      sys.props("java.io.tmpdir"),
      s"graft_s34${tag}_${s.sparkContext.applicationId}").toString
    Scratch.fresh(s, new Path(base))
    val custRoot = s"$base/customer"
    val ordRoot = s"$base/orders"
    commitWithNdv(graft.Tables.customer(s, dir)
      .select(pmod(col("c_custkey"), lit(NdvGateCohorts)).as("key")),
      custRoot, "key")
    commitWithNdv(graft.Tables.orders(s, dir)
      .select(pmod(col("o_custkey"), lit(NdvGateCohorts)).as("key")),
      ordRoot, "key")
    val (nA, dA) = ndvQuery(s, custRoot, "key")
    val (nB, dB) = ndvQuery(s, ordRoot, "key")
    val est = nA.toDouble * nB / math.max(dA, dB)
    val trueRows = read(s, custRoot).groupBy("key")
      .agg(count(lit(1)).as("na"))
      .join(read(s, ordRoot).groupBy("key")
        .agg(count(lit(1)).as("nb")), "key")
      .agg(sum(col("na") * col("nb"))).head().getLong(0)
    Seq((nA, nB, dA.toLong, dB.toLong,
      math.floor(est * 1e4 + 0.5) / 1e4, trueRows))
      .toDF("n_a", "n_b", "ndv_a", "ndv_b",
        "est_join_rows", "true_join_rows")
  }

  private[sources] val NdvGateCohorts = 199L

  // ——— table-level CHECK constraints (Delta `ALTER TABLE ADD
  // CONSTRAINT` semantics) — the ALWAYS-ON write-boundary invariant,
  // distinct from s16 Expectations (a dataset-level audit that
  // quarantines) and s29 WAP (a per-batch branch audit): once
  // declared, EVERY checked commit validates its incoming data and a
  // violating batch is REJECTED WHOLE, the table untouched. SQL CHECK
  // semantics: a row violates only when the predicate is FALSE —
  // NULL passes (that is what NOT NULL is for). Constraints live as
  // write-once marker files under `constraints/` (the branch-ref
  // pattern: tmp + rename-if-absent, crash-safe, name = identity),
  // so they survive restarts and engines, and reading them is one
  // tiny listing — O(constraints), never O(data).

  private def constraintDir(root: String) = new Path(root, "constraints")

  /** Declare a named CHECK constraint. Delta semantics: the EXISTING
    * table is scanned first and the declaration fails if current
    * data already violates — a constraint must never be born
    * broken. */
  def addConstraint(s: SparkSession, root: String, name: String,
      checkExpr: String): Unit = {
    require(name.matches("[A-Za-z0-9_]+"),
      s"constraint name '$name' must be [A-Za-z0-9_]+")
    if (snapshots(s, root).nonEmpty)
      requireNoViolations(read(s, root), Map(name -> checkExpr))
    val f = fs(s, root)
    f.mkdirs(constraintDir(root))
    val tmp = new Path(constraintDir(root), s".tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(s"$checkExpr\n".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!renameIfAbsent(f, tmp, new Path(constraintDir(root), name))) {
      f.delete(tmp, false)
      throw new IllegalStateException(s"constraint $name already exists")
    }
  }

  /** The declared constraint set: name → CHECK expression. */
  def constraintsOf(s: SparkSession, root: String): Map[String, String] = {
    val f = fs(s, root)
    if (!f.exists(constraintDir(root))) Map.empty
    else f.listStatus(constraintDir(root)).iterator
      .map(_.getPath)
      .filterNot(_.getName.startsWith("."))
      .map { p =>
        val in = f.open(p)
        try p.getName -> scala.io.Source
          .fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      }.toMap
  }

  /** ONE aggregate pass counting violations of every constraint at
    * once; throws with the full name → count map if any row fails
    * (SQL CHECK: only FALSE violates, NULL passes). */
  private def requireNoViolations(df: DataFrame,
      cs: Map[String, String]): Unit = {
    import org.apache.spark.sql.functions._
    if (cs.isEmpty) return
    val names = cs.keys.toSeq.sorted
    val row = df.agg(
      sum(lit(0L)).as("_z"),
      names.map(n => sum(when(
        coalesce(expr(cs(n)), lit(true)) === false, 1L)
        .otherwise(0L)).as(n)): _*).head()
    val bad = names.zipWithIndex.collect {
      case (n, i) if !row.isNullAt(i + 1) && row.getLong(i + 1) > 0 =>
        n -> row.getLong(i + 1)
    }
    if (bad.nonEmpty) throw new IllegalStateException(
      "CHECK constraint violation, commit rejected: " +
        bad.map { case (n, c) => s"$n ($c rows)" }.mkString(", "))
  }

  /** Append with the declared constraints enforced on the INCOMING
    * batch (existing data was validated when each constraint was
    * declared — the standing invariant makes re-scanning history
    * unnecessary, which is what keeps the check O(batch) at 100 TB).
    * Since round 12 this is an alias for [[appendCommit]]: EVERY
    * new-row write verb validates ([[enforceConstraints]]), so the
    * invariant can't be voided by an unchecked write interleaving. */
  def checkedAppend(df: DataFrame, root: String): Long =
    appendCommit(df, root)

  /** S35 — the constraint lifecycle end-to-end (the s29 fixture
    * shape): base = the clean `%3 = 0` lineitem slice; two
    * constraints declared (a range CHECK and a domain CHECK); the
    * clean `%3 = 1` batch passes the write boundary; the dirty
    * `%3 = 2` batch (every quantity negated) is rejected WHOLE with
    * the table untouched. The closed-form oracle (count / key-sum /
    * integral quantity-sum over the `%3 ∈ {0,1}` rows, plus the
    * constraint count and the rejection fact) breaks if the dirty
    * batch leaks, the clean one is lost, OR a declaration silently
    * fails. */
  def s35CheckConstraints(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(s, dir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"),
      s"graft_s35${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    commit(li.filter(col("l_orderkey") % 3 === 0), root)
    addConstraint(s, root, "qty_positive", "l_quantity > 0")
    addConstraint(s, root, "flag_known",
      "l_returnflag IN ('A', 'N', 'R')")
    checkedAppend(li.filter(col("l_orderkey") % 3 === 1), root)
    val rejected =
      try {
        checkedAppend(li.filter(col("l_orderkey") % 3 === 2)
          .withColumn("l_quantity", -col("l_quantity")), root)
        false
      } catch { case _: IllegalStateException => true }
    read(s, root).agg(
      count(lit(1)).cast("bigint").as("n_rows"),
      sum(col("l_orderkey")).cast("bigint").as("sum_keys"),
      sum(col("l_quantity").cast("bigint")).cast("bigint").as("sum_qty"),
      lit(constraintsOf(s, root).size).as("n_constraints"),
      lit(rejected).as("dirty_rejected"))
  }

  /** S29 — WRITE-AUDIT-PUBLISH end-to-end: the composition the s26
    * branches + s16 expectations surfaces exist FOR (the Iceberg WAP
    * idiom). Each ingest cycle stages its batch on a fork of `main`,
    * audits the staged table with the declarative expectation set,
    * and publishes by metadata-only fast-forward ONLY when zero rows
    * quarantine — a failed audit leaves `main` untouched and the
    * staging branch dangling for triage. Fixture: base = the
    * (naturally constraint-clean) `l_orderkey % 3 = 0` lineitem
    * slice; cycle 1 stages the clean `% 3 = 1` slice → publishes;
    * cycle 2 stages the `% 3 = 2` slice with every quantity negated →
    * the audit fires and the publish is withheld. The closed-form
    * oracle (count, key-sum, integral quantity-sum of the %3∈{0,1}
    * rows) breaks if the dirty batch leaks into main OR the clean one
    * is lost. At 100 TB: the audit is one scan of the staged branch,
    * the publish moves ~20 bytes. */
  def s29Wap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.ops.Expectations
    val li = graft.Tables.lineitem(s, dir)
      .select("l_orderkey", "l_quantity", "l_discount", "l_returnflag")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"),
      s"graft_s29${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    val v0 = commit(li.filter(col("l_orderkey") % 3 === 0), root)
    createBranch(s, root, "main", v0)
    def wapCycle(stage: String, batch: DataFrame): Boolean = {
      createBranch(s, root, stage,
        branchHead(s, root, "main").get)
      appendToBranch(batch, root, stage)
      val quarantined = Expectations.summarize(
        readBranch(s, root, stage), Expectations.lineitemExpectations)
        .select("n_quarantined").head().getLong(0)
      val pass = quarantined == 0L
      if (pass) fastForward(s, root, "main", stage)
      pass
    }
    wapCycle("stage-clean", li.filter(col("l_orderkey") % 3 === 1))
    wapCycle("stage-dirty", li.filter(col("l_orderkey") % 3 === 2)
      .withColumn("l_quantity", -col("l_quantity")))
    readBranch(s, root, "main").agg(
      count(lit(1)).as("n_rows"),
      sum(col("l_orderkey")).cast("bigint").as("sum_keys"),
      sum(col("l_quantity").cast("bigint")).cast("bigint").as("sum_qty"))
  }

  /** Schema-evolving read: like [[readSnapshot]] but unions the pinned
    * files' schemas BY NAME (`mergeSchema`), so rows from files written
    * before an additive evolution surface NULL for the later columns.
    * A production manifest would pin the table schema itself and skip
    * the per-file footer union (the Delta/Iceberg design); reading the
    * footers keeps this store engine-portable at the cost of one
    * footer read per file — metadata, not data. Old snapshots read
    * through [[readSnapshot]] keep their ORIGINAL schema: evolution is
    * append-only and never rewrites history. */
  def readEvolved(s: SparkSession, root: String,
      id: Option[Long] = None): DataFrame = {
    val lines = manifestLines(s, root, id) // one read, see readSnapshot
    val data = s.read.option("mergeSchema", "true")
      .parquet(dataFilesOf(lines): _*)
    val dvs = dvsOf(lines)
    if (dvs.isEmpty) data
    else applyDv(data, s.read.parquet(dvs: _*))
  }

  /** RESTORE (the Delta `RESTORE TABLE ... TO VERSION` verb): roll
    * the table back to snapshot `toId` by committing a NEW manifest
    * that pins the OLD snapshot's lines verbatim — data files carried
    * by reference (stats and DV sidecars included), so a rollback is
    * O(metadata) no matter the table size, readers resolve it like
    * any commit, and nothing after `toId` is deleted: the mistaken
    * snapshots stay time-travelable for the post-mortem (vacuum
    * reclaims them when policy says so). Returns the new snapshot id. */
  def restore(s: SparkSession, root: String, toId: Long): Long =
    // strip any ref marker: restoring to a BRANCH snapshot promotes
    // its content to the trunk — carrying the marker verbatim would
    // make the restored manifest invisible to trunk resolution
    commitManifest(s, root, manifestLines(s, root, Some(toId))
      .filterNot(_.startsWith(RefMarker + "\t")), 10)

  /** S23 — restore end-to-end: commit orders (v0), "fat-finger" a
    * destructive overwrite that drops every high-value row (v1), then
    * RESTORE to v0 and read the table back — the answer must be the
    * unfiltered base table, the v1 mistake must remain readable via
    * time travel, and the restore itself must write no data files.
    * The oracle checks answer-equality with the base table;
    * SnapshotStoreSpec pins the metadata-only + history contracts. */
  def s23Restore(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"), s"graft_s23${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    val v0 = commit(base, root)
    commit(base.filter(col("o_totalprice") <= 300000.0), root)
    restore(s, root, v0)
    read(s, root)
  }

  /** S22 — additive schema evolution end-to-end THROUGH the commit
    * protocol: commit even-keyed orders WITHOUT the status column
    * (snapshot 0), [[appendCommit]] the odd-keyed rows WITH it
    * (snapshot 1 — old files carried by reference, never rewritten),
    * then read the mixed-schema table back evolved and aggregate per
    * status, pre-evolution rows surfacing as the NULL→'pre_evolution'
    * bucket. The oracle replays the same split against the base
    * table; SnapshotStoreSpec pins the protocol side (carry-by-
    * reference, time-travel keeps the narrow schema, null placement).
    * At 100 TB additive evolution MUST be O(new data) — this is the
    * operator that proves the store never rewrites history for a
    * column add. */
  def s22SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(s, dir)
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"), s"graft_s22${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    commit(base.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_totalprice"), root)
    appendCommit(base.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderstatus"), root)
    readEvolved(s, root)
      .groupBy(coalesce(col("o_orderstatus"), lit("pre_evolution"))
        .as("status"))
      .agg(count(lit(1)).as("n_orders"),
        graft.ops.Det.dsum2(col("o_totalprice")).as("sum_price"))
  }

  /** INCREMENTAL JOIN-VIEW MAINTENANCE — the bilinear delta rule
    * (V = A⋈B ⇒ ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) specialized to the
    * PK-FK shape every star schema has: the view is keyed by A's
    * primary key, so maintenance is a keyed upsert, not a bag merge.
    * Two passes, both churn-proportional:
    *   1. ΔB patch: existing view rows with a churned FK get the
    *      dim's new attributes in place; a dim DELETE cascades (inner
    *      join semantics — the row leaves the view). One keyed join
    *      of the view against the (tiny) ΔB set — in production the
    *      MV is bucketed on the FK, making this co-located.
    *   2. ΔA replace: view rows whose PK was touched are dropped
    *      (anti join on the ΔA key set) and re-derived by joining the
    *      ΔA postimage against B1 — post-churn B, so the ΔA⋈ΔB cross
    *      term needs no special case (an inserted fact referencing an
    *      updated dim lands with the NEW dim attributes).
    * Dim INSERTS need no view pass at all: in an FK-valid base no
    * existing fact references a customer that did not exist yet.
    * Work = O(|ΔA| + |ΔB| + view fan-out of the churned FKs) — the
    * last term is rows that genuinely change; the full A1⋈B1
    * recompute never runs. At 100 TB this is how a denormalized
    * serving table tracks a churning warehouse within seconds. */
  def applyJoinDelta(mv: DataFrame, dA: DataFrame, dB: DataFrame,
      b1: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val bDel = dB.filter(col("change_type") === "delete")
      .select(col("c_custkey"))
    val bUpd = dB.filter(col("change_type") === "update")
      .select(col("c_custkey"), col("c_mktsegment").as("seg_new"))
    val patched = mv
      .join(bDel, mv("o_custkey") === bDel("c_custkey"), "left_anti")
      .join(bUpd, mv("o_custkey") === bUpd("c_custkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        coalesce(col("seg_new"), col("c_mktsegment")).as("c_mktsegment"))
    val aLive = dA.filter(col("change_type") =!= "delete")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val refreshed = aLive
      .join(b1, aLive("o_custkey") === b1("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("c_mktsegment"))
    patched
      .join(dA.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .unionByName(refreshed)
  }

  /** S25 — incremental JOIN-view maintenance end-to-end: materialize
    * orders⋈customer keyed by the order key, churn BOTH sides
    * deterministically (fact: deletes %97≡5, price bumps %13≡2,
    * inserted copies %100≡7 at key+50M; dim: segment rewrites %50≡7,
    * deletes %199≡11, unreferenced inserts at key+3M), then fold the
    * two keyed change sets into the view with [[applyJoinDelta]].
    * The oracle recomputes A1⋈B1 from scratch — the maintained view
    * must be indistinguishable from the recompute, including the
    * cascade (orders of a deleted customer vanish) and the cross
    * term (an inserted order referencing a rewritten customer
    * carries the NEW segment). Completes the MV story next to s15's
    * grouped-agg case: agg views fold signed contributions, join
    * views patch-and-replace by key. */
  def s25IncrementalJoinMv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val a0 = graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val b0 = graft.Tables.customer(s, dir)
      .select("c_custkey", "c_mktsegment")
    val a1 = a0.filter(col("o_orderkey") % 97 =!= 5)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 2, col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")))
      .union(a0.filter(col("o_orderkey") % 100 === 7)
        .withColumn("o_orderkey", col("o_orderkey") + FactPlantOffset))
    val b1 = b0.filter(col("c_custkey") % 199 =!= 11)
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 50 === 7, "MACHINERY")
          .otherwise(col("c_mktsegment")))
      .union(b0.filter(col("c_custkey") % 150 === 0)
        .select((col("c_custkey") + DimPlantOffset).as("c_custkey"),
          lit("FURNITURE").as("c_mktsegment")))
    val mv0 = a0.join(b0, a0("o_custkey") === b0("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("c_mktsegment"))
    applyJoinDelta(mv0,
      keyedChanges(a0, a1, "o_orderkey"),
      keyedChanges(b0, b1, "c_custkey"), b1)
  }

  /** S24 — VACUUM end-to-end (the Delta `VACUUM` / Iceberg
    * expire-snapshots verb): commit orders (v0), overwrite with the
    * sub-threshold slice (v1), then vacuum with keepLast=1 — v0's
    * manifest AND the data directories only it references are
    * physically reclaimed — and read the live table back. Inline
    * requires pin the reclaim really happened (history shrank to one
    * snapshot, ≥1 data dir deleted); the oracle checks the surviving
    * answer is exactly v1, i.e. the reclaim touched only dead files.
    * At 100 TB vacuum is the storage-cost control every snapshot
    * store needs: cost is O(manifest lines + dead dirs), never a
    * data scan, and the manifest-first delete order keeps concurrent
    * readers consistent (see [[vacuum]]). SnapshotStoreSpec pins the
    * file-level contract incl. live-DV survival. */
  def s24Vacuum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new Path(
      sys.props("java.io.tmpdir"),
      s"graft_s24${tag}_${s.sparkContext.applicationId}/t").toString
    Scratch.fresh(s, new Path(root).getParent)
    commit(base.repartition(4), root)
    commit(base.filter(col("o_orderkey") % 5 =!= 2), root)
    val removed = vacuum(s, root, keepLast = 1, minAgeMs = 0)
    require(removed >= 1, s"vacuum reclaimed nothing (removed=$removed)")
    val left = snapshots(s, root)
    require(left.length == 1, s"history not pruned: $left")
    read(s, root)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s25_incremental_join_mv" -> s25IncrementalJoinMv,
    "s24_vacuum" -> s24Vacuum,
    "s12_snapshot_changes" -> s12SnapshotChanges,
    "s14_snapshot_skipping" -> s14SnapshotSkipping,
    "s15_incremental_mv" -> s15IncrementalMv,
    "s20_compaction" -> s20Compaction,
    "s21_delete_vectors" -> s21DeleteVectors,
    "s22_schema_evolution" -> s22SchemaEvolution,
    "s23_restore" -> s23Restore,
    "s26_branches" -> s26Branches,
    "s27_concurrent_appends" -> s27ConcurrentAppends,
    "s28_stats_only" -> s28StatsOnly,
    "s29_wap" -> s29Wap,
    "s31_stats_join" -> s31StatsJoin,
    "s32_optimize_zorder" -> s32OptimizeZorder,
    "s33_shallow_clone" -> s33ShallowClone,
    "s34_ndv_join_estimate" -> s34NdvJoinEstimate,
    "s35_check_constraints" -> s35CheckConstraints)

  val oracle: Map[String, String] = Map(
    // src must be byte-unchanged by the clone's append; the clone =
    // src + the shifted %10 slice (stride = max(key)+1, scale-safe)
    "s33_shallow_clone" ->
      """WITH b AS (SELECT o_orderkey FROM orders),
         st AS (SELECT max(o_orderkey) + 1 AS stride FROM b),
         cl AS (SELECT o_orderkey FROM b
                UNION ALL
                SELECT o_orderkey + stride FROM b, st
                WHERE o_orderkey % 10 = 0)
         SELECT 'src' AS side, cast(count(*) AS bigint) AS n_rows,
           cast(sum(o_orderkey) AS bigint) AS sum_keys FROM b
         UNION ALL
         SELECT 'clone', cast(count(*) AS bigint),
           cast(sum(o_orderkey) AS bigint) FROM cl""",
    // the band read after the recluster must equal the raw scan:
    // a recluster that lost/duplicated/resurrected a row breaks this
    "s32_optimize_zorder" ->
      """WITH m AS (SELECT max(o_custkey) AS k FROM orders)
         SELECT cast(count(*) AS bigint) AS n_rows,
           cast(sum(o_orderkey) AS bigint) AS sum_keys
         FROM orders, m
         WHERE o_custkey >= k // 4 AND o_custkey <= k // 2""",
    // the join result is invariant to the broadcast decision the
    // metadata made — correctness and strategy are orthogonal
    "s31_stats_join" ->
      """SELECT c_mktsegment,
           cast(count(*) AS bigint) AS n_orders,
           cast(sum(o_orderkey) AS bigint) AS sum_keys
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    // the s35 closed form: the %3∈{0,1} slices only — the dirty
    // batch must have been rejected whole and the declarations must
    // have stuck (quantities integral → exact bigint sum)
    "s35_check_constraints" ->
      """SELECT cast(count(*) AS bigint) AS n_rows,
           cast(sum(l_orderkey) AS bigint) AS sum_keys,
           cast(sum(cast(l_quantity AS bigint)) AS bigint) AS sum_qty,
           cast(2 AS int) AS n_constraints,
           true AS dirty_rejected
         FROM lineitem WHERE l_orderkey % 3 IN (0, 1)""",
    // the s34 closed form: bounded cohort domain (199 < k) with an
    // injective hash makes every sketch NDV the exact distinct
    // count; the estimate replays the CBO uniform rule in the same
    // IEEE ops, the truth column the aggregate-then-multiply sum
    "s34_ndv_join_estimate" ->
      s"""WITH a AS (SELECT c_custkey % $NdvGateCohorts AS key
             FROM customer),
           b AS (SELECT o_custkey % $NdvGateCohorts AS key
             FROM orders),
           sa AS (SELECT cast(count(*) AS bigint) AS n,
             cast(count(DISTINCT key) AS bigint) AS d FROM a),
           sb AS (SELECT cast(count(*) AS bigint) AS n,
             cast(count(DISTINCT key) AS bigint) AS d FROM b),
           tj AS (SELECT cast(sum(ca.n * cb.n) AS bigint) AS t FROM
             (SELECT key, cast(count(*) AS bigint) AS n FROM a
              GROUP BY 1) ca
             JOIN
             (SELECT key, cast(count(*) AS bigint) AS n FROM b
              GROUP BY 1) cb USING (key))
         SELECT sa.n AS n_a, sb.n AS n_b, sa.d AS ndv_a,
           sb.d AS ndv_b,
           floor(cast(sa.n AS double) * sb.n / greatest(sa.d, sb.d)
             * 10000.0 + 0.5) / 10000.0 AS est_join_rows,
           tj.t AS true_join_rows
         FROM sa, sb, tj""",
    // main after both WAP cycles = base + the clean batch only: the
    // dirty batch (negated quantities) failed its audit and was never
    // published (quantities are integral-valued, so the bigint cast
    // makes the sum exact cross-engine)
    "s29_wap" ->
      """SELECT cast(count(*) AS bigint) AS n_rows,
           cast(sum(l_orderkey) AS bigint) AS sum_keys,
           cast(sum(cast(l_quantity AS bigint)) AS bigint) AS sum_qty
         FROM lineitem
         WHERE l_orderkey % 3 = 0 OR l_orderkey % 3 = 1""",
    // the stats-only answer must equal the scan answer exactly
    "s28_stats_only" ->
      """SELECT cast(count(*) AS bigint) AS n_rows,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
         FROM orders""",
    // closed form: base ∪ all 6 racing appenders' slices — every
    // key of orders appears once as itself and once shifted by
    // stride·((key mod 6)+1), stride = max(key)+1 (scale-relative,
    // so the bigint key-sum never overflows at higher SFs); a single
    // lost update breaks both the count and the exact sum
    "s27_concurrent_appends" ->
      s"""WITH b AS (SELECT o_orderkey FROM orders),
         st AS (SELECT max(o_orderkey) + 1 AS stride FROM b),
         planted AS (
           SELECT o_orderkey FROM b
           UNION ALL
           SELECT o_orderkey + stride * ((o_orderkey % 6) + 1)
           FROM b, st)
         SELECT cast(count(*) AS bigint) AS n_rows,
           cast(sum(o_orderkey) AS bigint) AS sum_keys FROM planted""",
    // closed form: each branch = base + its own plant; release == exp
    "s26_branches" ->
      s"""WITH b AS (SELECT o_orderkey FROM orders),
         e AS (SELECT o_orderkey + ${BranchExpOffset} AS o_orderkey
               FROM b WHERE o_orderkey % 5 = 0),
         m AS (SELECT o_orderkey + ${BranchMainOffset} AS o_orderkey
               FROM b WHERE o_orderkey % 7 = 0),
         exp_v AS (SELECT * FROM b UNION ALL SELECT * FROM e),
         main_v AS (SELECT * FROM b UNION ALL SELECT * FROM m)
         SELECT 'exp' AS branch, cast(count(*) AS bigint) AS n_rows,
           cast(sum(o_orderkey) AS bigint) AS sum_keys FROM exp_v
         UNION ALL
         SELECT 'main', cast(count(*) AS bigint),
           cast(sum(o_orderkey) AS bigint) FROM main_v
         UNION ALL
         SELECT 'release', cast(count(*) AS bigint),
           cast(sum(o_orderkey) AS bigint) FROM exp_v""",
    "s25_incremental_join_mv" ->
      s"""WITH a1 AS (
           SELECT o_orderkey, o_custkey,
             o_totalprice + CASE WHEN o_orderkey % 13 = 2
               THEN 1000.0 ELSE 0.0 END AS o_totalprice
           FROM orders WHERE o_orderkey % 97 <> 5
           UNION ALL
           SELECT o_orderkey + $FactPlantOffset, o_custkey, o_totalprice
           FROM orders WHERE o_orderkey % 100 = 7),
         b1 AS (
           SELECT c_custkey,
             CASE WHEN c_custkey % 50 = 7 THEN 'MACHINERY'
                  ELSE c_mktsegment END AS c_mktsegment
           FROM customer WHERE c_custkey % 199 <> 11
           UNION ALL
           SELECT c_custkey + $DimPlantOffset, 'FURNITURE'
           FROM customer WHERE c_custkey % 150 = 0)
         SELECT a.o_orderkey, a.o_custkey, a.o_totalprice,
           b.c_mktsegment
         FROM a1 a JOIN b1 b ON a.o_custkey = b.c_custkey""",
    "s24_vacuum" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
         FROM orders WHERE o_orderkey % 5 <> 2""",
    "s23_restore" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
         FROM orders""",
    "s22_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus
                     ELSE 'pre_evolution' END AS status,
           cast(count(*) AS bigint) AS n_orders,
           cast(sum(cast(o_totalprice AS decimal(12,2))) AS double)
             AS sum_price
         FROM orders GROUP BY 1""",
    "s21_delete_vectors" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
         FROM orders
         WHERE NOT (o_orderkey % 7 = 3)
           AND NOT (o_totalprice > 400000.0)""",
    "s20_compaction" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
         FROM orders""",
    "s15_incremental_mv" ->
      s"""WITH base AS (
           SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
         v1 AS (
           SELECT c_custkey,
             CASE WHEN c_custkey % 50 = 7 THEN 'MACHINERY'
                  ELSE c_mktsegment END AS c_mktsegment,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 250.0
                  ELSE c_acctbal END AS c_acctbal
           FROM base WHERE c_custkey % 97 <> 3
           UNION ALL
           SELECT c_custkey + $DimPlantOffset, c_mktsegment, c_acctbal
           FROM base WHERE c_custkey % 100 = 0)
         SELECT c_mktsegment,
           cast(count(*) AS bigint) AS n_rows,
           cast(sum(cast(c_acctbal AS decimal(12,2))) AS double)
             AS sum_bal
         FROM v1 GROUP BY 1""",
    "s14_snapshot_skipping" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
         FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000""",
    "s12_snapshot_changes" ->
      s"""WITH base AS (
           SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
         v1 AS (
           SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 250.0
                  ELSE c_acctbal END AS c_acctbal
           FROM base WHERE c_custkey % 97 <> 3
           UNION ALL
           SELECT c_custkey + $DimPlantOffset, c_mktsegment, c_acctbal
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

  /** Default vacuum retention: a data dir younger than this is never
    * reclaimed even if no manifest references it yet. Protects the
    * writer-race window: committer A has written data/snap-X but not
    * yet renamed its manifest when vacuum lists the table — without
    * the age guard vacuum deletes snap-X as an orphan and A's commit
    * then publishes a manifest pointing at deleted files (the Delta
    * retention-period idea, scaled to this store's commit latency). */
  val DefaultVacuumRetentionMs: Long = 20L * 60 * 1000

  /** Delete data directories no manifest references (crashed commits
    * and vacuumed history). `keepLast` manifests are retained; older
    * manifest files AND the data dirs only they reference are
    * removed. Returns the number of data directories deleted.
    *
    * Concurrency: manifests are deleted FIRST, so a concurrent
    * reader either sees an old manifest with intact files or
    * neither. Writers are protected two ways: dirs younger than
    * `minAgeMs` are skipped (in-flight commit whose manifest has not
    * landed — see [[DefaultVacuumRetentionMs]]; pass 0 only when no
    * concurrent writer can exist, as the single-session demo queries
    * and tests do), and the kept-file set is re-derived from any
    * manifest that LANDED after the first listing, so a commit that
    * raced the listing keeps its data. */
  def vacuum(s: SparkSession, root: String, keepLast: Int = 1,
      minAgeMs: Long = DefaultVacuumRetentionMs): Int = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val f = fs(s, root)
    val ids = snapshots(s, root)
    // branch refs are retention ROOTS: a ref'd manifest (and its
    // data) must survive however old its id is, or every branch
    // head older than keepLast would dangle after a vacuum
    val refDir = new Path(root, "refs")
    val refIds: Set[Long] =
      if (!f.exists(refDir)) Set.empty
      else f.listStatus(refDir).toSeq.map(_.getPath.getName)
        .filterNot(_.startsWith("."))
        .flatMap { n =>
          try branchHead(s, root, n)
          catch { case _: Exception => None }
        }.toSet
    // the TRUNK HEAD is a retention root too: with branch commits at
    // the top of the global log, a keepLast window of branch ids
    // would otherwise delete the newest trunk manifest and orphan
    // the whole trunk lineage
    val trunkPin = trunkLatestId(s, root)
    val pinned = refIds ++ (if (trunkPin >= 0) Set(trunkPin)
                            else Set.empty[Long])
    val (drop, keep) = {
      val (d, k) = ids.splitAt(math.max(0, ids.length - keepLast))
      (d.filterNot(pinned), k ++ d.filter(pinned))
    }
    // retained data dirs: parents of kept data files, plus kept DV
    // sidecar dirs (they live directly under data/)
    def referenced(of: Seq[Long]): Set[String] =
      (of.flatMap(i => manifestFiles(s, root, Some(i)))
        .map(p => new Path(p).getParent.toUri.getPath) ++
        of.flatMap(i => dvPaths(s, root, Some(i)))
          .map(p => new Path(p).toUri.getPath)).toSet
    val keptFiles = referenced(keep)
    if (drop.nonEmpty) {
      // Deleting unpinned ids above a pinned one punches a mid-log
      // gap; record the highest to-be-deleted id so latestId
      // distrusts any hint-derived probe that stops at or below it,
      // and refresh the hint to the global head while the full
      // listing is in hand. The floor write is WRITE-AHEAD — it must
      // be durable BEFORE the first deletion, or a reader probing
      // from a lagged hint in the window between delete and floor
      // write would trust a gap-stopped probe and its next commit
      // would reclaim a vacuumed id (the fork this guard exists to
      // prevent). writeFloor read-back-verifies; if the floor could
      // not be recorded the deletion pass ABORTS — skipping a vacuum
      // only costs disk, deleting without the guard risks the fork.
      if (!writeFloor(f, root, drop.max)) return 0
      writeHint(f, root, ids.last)
    }
    drop.foreach(i => f.delete(manifestPath(root, i), false))
    val dataRoot = new Path(root, "data")
    if (!f.exists(dataRoot)) return 0
    val now = System.currentTimeMillis()
    val stale0 = f.listStatus(dataRoot).toSeq
      .filter(st => now - st.getModificationTime >= minAgeMs)
      .map(_.getPath)
      .filter(p => !keptFiles.contains(p.toUri.getPath))
    // a commit that landed between the listing above and here must
    // keep its dirs: re-derive the kept set for any NEW manifest ids
    val landed = snapshots(s, root).filterNot(ids.contains)
    val lateKept = if (landed.isEmpty) Set.empty[String]
                   else referenced(landed)
    val stale = stale0.filterNot(p => lateKept.contains(p.toUri.getPath))
    stale.foreach(p => f.delete(p, true))
    stale.length
  }
}

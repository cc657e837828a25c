package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Manifest-commit contract: consistent multi-file reads, time
  * travel, crash invisibility, vacuum — plus the swapInto crash
  * recovery rule (same package so the private[sources] swap is
  * drivable directly). */
class SnapshotStoreSpec extends SparkTestBase {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snap").toString + "/t"

  test("keyedChanges: insert/delete/update fates; unchanged rows emit nothing") {
    import spark.implicits._
    val root = freshRoot()
    val v0 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "seg", "bal")
    val v1 = Seq((1L, "a", 10.0),   // unchanged → silent
      (2L, "b", 25.0),              // update
      (4L, "d", 40.0))              // insert; 3 deleted
      .toDF("id", "seg", "bal")
    SnapshotStore.commit(v0, root)
    SnapshotStore.commit(v1, root)
    val got = SnapshotStore.changesBetween(spark, root, 0L, 1L, "id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSet
    assert(got == Set(
      ("update", 2L, "b", 25.0),
      ("delete", 3L, "c", 30.0),
      ("insert", 4L, "d", 40.0)))
  }

  test("compact: small files collapse, big files carry by reference, " +
      "content and history survive") {
    import spark.implicits._
    val root = freshRoot()
    // one healthy big file + a 32-file small tail under one snapshot:
    // commit the big part, then splice a fragmented layout in by
    // committing the union fragmented — instead build it directly:
    // write the whole table in 33 parts where part 0 is large
    val big = spark.range(0, 200000L).select(col("id"), lit("big").as("src"))
    val tail = spark.range(200000L, 201000L)
      .select(col("id"), lit("tail").as("src")).repartition(32)
    SnapshotStore.commit(big.coalesce(1).union(tail), root)
    val before = SnapshotStore.manifestFiles(spark, root)
    val sizes = before.map(p => p -> new java.io.File(
      new java.net.URI(p).getPath).length)
    val bigFiles = sizes.filter(_._2 >= (1L << 18) / 2).map(_._1)
    assert(before.size >= 30, s"expected a fragmented layout, got ${before.size}")
    val id = SnapshotStore.compact(spark, root, targetBytes = 1L << 18)
    assert(id == 1L)
    val after = SnapshotStore.manifestFiles(spark, root)
    // every healthy file survives by reference (same path, no rewrite)
    bigFiles.foreach(p => assert(after.contains(p), s"big file $p rewritten"))
    assert(after.size < before.size / 2,
      s"compaction barely helped: ${before.size} -> ${after.size}")
    // content identical, history intact
    assert(SnapshotStore.read(spark, root).count() == 201000L)
    assert(SnapshotStore.readSnapshot(spark, root, Some(0L))
      .count() == 201000L)
    val sums = SnapshotStore.read(spark, root).agg(sum("id")).head().getLong(0)
    assert(sums == 201000L * 200999L / 2)
    // idempotence: nothing left to compact → same id back, no commit
    assert(SnapshotStore.compact(spark, root, 1L << 18) == 1L)
    assert(SnapshotStore.snapshots(spark, root) == Seq(0L, 1L))
  }

  test("commit/read/time-travel: latest wins, history stays readable") {
    import spark.implicits._
    val root = freshRoot()
    val v0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(3)
    val v1 = Seq((1L, "a2"), (3L, "c")).toDF("id", "v").repartition(2)
    assert(SnapshotStore.commit(v0, root) == 0L)
    assert(SnapshotStore.commit(v1, root) == 1L)
    assert(SnapshotStore.snapshots(spark, root) == Seq(0L, 1L))
    val latest = SnapshotStore.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(latest == Set((1L, "a2"), (3L, "c")))
    val old = SnapshotStore.readSnapshot(spark, root, Some(0L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(old == Set((1L, "a"), (2L, "b")))
  }

  test("reader resolved before a commit still sees its snapshot " +
      "after the rewrite lands") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commit(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x").repartition(4), root)
    // reader resolves the CURRENT manifest's file list (what a real
    // concurrent reader holds mid-query)...
    val pinnedFiles = SnapshotStore.manifestFiles(spark, root)
    val pinned = spark.read.parquet(pinnedFiles: _*)
    // ...then a full rewrite commits underneath it
    SnapshotStore.commit(
      Seq((9L, 90.0)).toDF("id", "x"), root)
    // the pinned read is untouched: snapshot files are immutable and
    // never deleted by commit
    assert(pinned.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // and a fresh reader sees only the new snapshot
    assert(SnapshotStore.read(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(9L))
  }

  test("crash between data write and manifest rename is invisible") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commit(Seq((1L, "live")).toDF("id", "v"), root)
    // simulate the crash window: data files written, NO manifest
    Seq((666L, "half-written")).toDF("id", "v")
      .write.parquet(s"$root/data/snap-crashed")
    assert(SnapshotStore.snapshots(spark, root) == Seq(0L))
    assert(SnapshotStore.read(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "a manifest-less data dir must never surface to readers")
  }

  test("history + timestamp time travel resolve the right snapshots") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commit(Seq((1L, "v0")).toDF("id", "v"), root)
    Thread.sleep(50) // distinct manifest mtimes even at coarse FS res
    SnapshotStore.commit(
      Seq((1L, "v1"), (2L, "v1")).toDF("id", "v"), root)
    Thread.sleep(50)
    SnapshotStore.deleteWhere(spark,
      root, org.apache.spark.sql.functions.col("id") === 1L)
    val h = SnapshotStore.history(spark, root)
    assert(h.map(_._1) == Seq(0L, 1L, 2L), "ids ascending")
    assert(h.map(_._2).sorted == h.map(_._2), "commit times monotone")
    assert(h.forall(_._3 >= 1), "per-snapshot file counts present")
    assert(h.last._5 == 1 && h.head._5 == 0,
      "DV sidecar count appears only on the merge-on-read snapshot")
    assert(h.forall(_._4 > 0), "data byte totals present")
    // as-of the SECOND commit's instant → snapshot 1's content
    val asOf = SnapshotStore.readAsOf(spark, root, h(1)._2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(asOf == Set((1L, "v1"), (2L, "v1")))
    // before the first commit → error
    intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, root, h.head._2 - 1)
    }
  }

  test("stats survive compaction for carried files; pruned range " +
      "reads apply deletion vectors") {
    import spark.implicits._
    val root = freshRoot()
    // one big clustered file + a small tail, committed WITH stats
    val big = spark.range(0, 100000L)
      .select(col("id"), (col("id") % 97).as("x")).coalesce(1)
    val tail = spark.range(100000L, 100200L)
      .select(col("id"), (col("id") % 97).as("x")).repartition(8)
    SnapshotStore.commitWithStats(big.union(tail), root, "id")
    SnapshotStore.compact(spark, root, targetBytes = 1L << 18)
    // the carried big file must still prune: a range entirely inside
    // the tail cannot keep every file conservatively
    val (kept, total) = SnapshotStore.pruneFiles(
      spark, root, "id", 100000L, 100100L)
    assert(total >= 2 && kept.length < total,
      s"stats lost in compaction: kept ${kept.length} of $total")
    // DV + stats interplay: delete a slice, then a pruned range read
    // over it must not resurrect the dead rows
    SnapshotStore.deleteWhere(spark, root, col("id") % 10 === 3L)
    val got = SnapshotStore
      .readPruned(spark, root, "id", 0L, 1000L)
      .collect().map(_.getLong(0)).toSet
    val want = (0L to 1000L).filterNot(_ % 10 == 3).toSet
    assert(got == want, "pruned range read diverges under a DV")
  }

  test("vacuum drops unreferenced data dirs, keeps the live snapshot") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commit(Seq((1L, "v0")).toDF("id", "v"), root)
    SnapshotStore.commit(Seq((2L, "v1")).toDF("id", "v"), root)
    SnapshotStore.commit(Seq((3L, "v2")).toDF("id", "v"), root)
    // plus one crashed-commit orphan
    Seq((7L, "orphan")).toDF("id", "v").write.parquet(s"$root/data/snap-x")
    val removed = SnapshotStore.vacuum(spark, root, keepLast = 1,
      minAgeMs = 0)
    assert(removed == 3, s"expected 2 old snapshots + 1 orphan, got $removed")
    assert(SnapshotStore.snapshots(spark, root) == Seq(2L))
    assert(SnapshotStore.read(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("s25 maintained join view == full recompute, incl. cascade " +
      "and cross term") {
    import org.apache.spark.sql.functions._
    // sf0.01: the smallest SF where the strict cross-term fixture
    // (inserted order -> genuinely rewritten customer) has a witness
    val sf = "/root/testdata/sf0.01"
    val mv = SnapshotStore.s25IncrementalJoinMv(spark, sf)
    // the recompute the oracle runs, here in Spark for a closed loop
    val a0 = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val b0 = graft.Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment")
    val a1 = a0.filter(col("o_orderkey") % 97 =!= 5)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 2, col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")))
      .union(a0.filter(col("o_orderkey") % 100 === 7)
        .withColumn("o_orderkey", col("o_orderkey") + (1L << 40)))
    val b1 = b0.filter(col("c_custkey") % 199 =!= 11)
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 50 === 7, "MACHINERY")
          .otherwise(col("c_mktsegment")))
      .union(b0.filter(col("c_custkey") % 150 === 0)
        .select((col("c_custkey") + (1L << 41)).as("c_custkey"),
          lit("FURNITURE").as("c_mktsegment")))
    val full = a1.join(b1, a1("o_custkey") === b1("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("c_mktsegment"))
    assert(mv.exceptAll(full).isEmpty && full.exceptAll(mv).isEmpty,
      "maintained view diverges from the recompute")
    // the churn cases the delta rule must cover actually occur
    val custDeleted = b0.filter(col("c_custkey") % 199 === 11)
      .select("c_custkey")
    assert(a0.join(custDeleted,
      a0("o_custkey") === custDeleted("c_custkey")).count() > 0,
      "fixture: no order cascades from a customer delete")
    // cross term pinned strictly: only customers whose segment was
    // ACTUALLY rewritten (%50==7 and not naturally MACHINERY) count,
    // and every inserted order referencing one must carry the NEW
    // segment — a regression to pre-churn B would fail both ways
    val rewritten = b0.filter(col("c_custkey") % 50 === 7 &&
      col("c_mktsegment") =!= "MACHINERY").select("c_custkey")
    val crossRows = mv.filter(col("o_orderkey") > (1L << 40))
      .join(rewritten, mv("o_custkey") === rewritten("c_custkey"))
    assert(crossRows.count() > 0,
      "fixture: no inserted order hits a rewritten customer (cross term)")
    assert(crossRows.filter(col("c_mktsegment") =!= "MACHINERY").count()
      == 0, "cross-term rows must carry the post-churn dim attributes")
  }

  test("s24 composition leaves one manifest and only live data dirs") {
    val sf = "/root/testdata/sf0.001"
    val n = SnapshotStore.s24Vacuum(spark, sf).count()
    assert(n > 0)
    val tag = sf.replaceAll("[^A-Za-z0-9]+", "_")
    val root = new org.apache.hadoop.fs.Path(
      sys.props("java.io.tmpdir"),
      s"graft_s24${tag}_${spark.sparkContext.applicationId}/t").toString
    assert(SnapshotStore.snapshots(spark, root).length == 1)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = SnapshotStore
      .manifestFiles(spark, root, None)
      .map(p => new org.apache.hadoop.fs.Path(p).getParent.toUri.getPath)
      .toSet
    val onDisk = fs
      .listStatus(new org.apache.hadoop.fs.Path(root, "data"))
      .map(_.getPath.toUri.getPath).toSet
    assert(onDisk == live,
      s"stale dirs survive vacuum: ${onDisk -- live}")
  }

  test("data skipping: stats commit prunes files from the manifest " +
      "alone; plain commits are kept conservatively") {
    import spark.implicits._
    val root = freshRoot()
    // range-clustered layout: 8 files, each owning ~125 consecutive ids
    val df = (0L until 1000L).map(i => (i, i * 2.0)).toDF("id", "x")
      .repartitionByRange(8, col("id"))
    SnapshotStore.commitWithStats(df, root, "id")
    val (kept, total) = SnapshotStore.pruneFiles(
      spark, root, "id", 300L, 320L)
    assert(total == 8, s"expected 8 stats-bearing files, got $total")
    assert(kept.size <= 2, s"narrow range must prune to <=2 files, " +
      s"kept ${kept.size} of $total")
    val got = SnapshotStore.readPruned(spark, root, "id", 300L, 320L)
      .collect().map(_.getLong(0)).toSet
    assert(got == (300L to 320L).toSet,
      "pruned read must equal the plain filter")
    // a stats-less commit of the same data: every file survives the
    // prune (no stats → conservative keep), answer unchanged
    val root2 = freshRoot()
    SnapshotStore.commit(df, root2)
    val (kept2, total2) = SnapshotStore.pruneFiles(
      spark, root2, "id", 300L, 320L)
    assert(kept2.size == total2,
      "files without stats must never be skipped")
  }

  test("cdfChanges: update emits preimage+postimage; incremental agg " +
      "equals recompute across a group-moving churn") {
    import spark.implicits._
    val v0 = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0),
      (4L, "b", 40.0)).toDF("id", "seg", "bal")
    val v1 = Seq((1L, "a", 10.0),   // unchanged
      (2L, "b", 20.0),              // group move a→b, same bal
      (3L, "b", 35.0),              // in-place update
      (5L, "c", 50.0))              // insert; 4 deleted
      .toDF("id", "seg", "bal")
    val ch = SnapshotStore.cdfChanges(v0, v1, "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSet
    assert(ch == Set(
      ("update_preimage", 2L, "a", 20.0),
      ("update_postimage", 2L, "b", 20.0),
      ("update_preimage", 3L, "b", 30.0),
      ("update_postimage", 3L, "b", 35.0),
      ("delete", 4L, "b", 40.0),
      ("insert", 5L, "c", 50.0)))
    val mv1 = SnapshotStore.applyCdfDelta(
      SnapshotStore.aggState(v0, "seg", "bal"),
      SnapshotStore.cdfChanges(v0, v1, "id"), "seg", "bal")
      .select(col("seg"), col("n_rows"),
        col("s_dec").cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val recompute = SnapshotStore.aggState(v1, "seg", "bal")
      .select(col("seg"), col("n_rows"),
        col("s_dec").cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(mv1 == recompute,
      s"maintained view $mv1 != recompute $recompute")
    // group "a" shrank to 1 via the move-out; a vanished group test:
    // delete everything in "c" from v1
    val v2 = v1.filter(col("seg") =!= "c")
    val mv2 = SnapshotStore.applyCdfDelta(
      SnapshotStore.aggState(v1, "seg", "bal"),
      SnapshotStore.cdfChanges(v1, v2, "id"), "seg", "bal")
    assert(!mv2.collect().map(_.getString(0)).contains("c"),
      "zero-count groups must disappear from the maintained view")
  }

  test("swapInto recovery: a prior crash's _old copy is restored, " +
      "not destroyed, by the next swap") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_swap").toString
    val dst = s"$base/t"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dst), spark.sparkContext.hadoopConfiguration)
    // committed table, then simulate a crash BETWEEN swapInto's two
    // renames: dst was moved aside, the new copy never landed
    Seq((1L, "committed")).toDF("id", "v").write.parquet(dst)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dst),
      new org.apache.hadoop.fs.Path(dst + "_old")))
    // next swap must first RESTORE dst from _old (the only committed
    // copy), then proceed — the pre-fix code deleted _old here
    Seq((2L, "next")).toDF("id", "v").write.parquet(dst + "_tmp")
    CsvIO.swapInto(spark, dst + "_tmp", dst)
    val rows = spark.read.parquet(dst)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((2L, "next")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dst + "_old")))
    // and the stale-_old case still cleans up: both present → _old
    // is a leftover of a COMPLETED swap
    Seq((3L, "again")).toDF("id", "v").write.parquet(dst + "_tmp")
    assert(fs.rename(new org.apache.hadoop.fs.Path(dst + "_tmp"),
      new org.apache.hadoop.fs.Path(dst + "_old"))) // fake stale leftover
    Seq((4L, "final")).toDF("id", "v").write.parquet(dst + "_tmp")
    CsvIO.swapInto(spark, dst + "_tmp", dst)
    assert(spark.read.parquet(dst).collect().map(_.getLong(0)).toSet
      == Set(4L))
  }
  test("branches: ref isolation, no data copied, fast-forward publish, " +
      "duplicate create fails") {
    import spark.implicits._
    val root = freshRoot()
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "seg")
    val v0 = SnapshotStore.commit(base, root)
    SnapshotStore.createBranch(spark, root, "exp", v0)
    SnapshotStore.createBranch(spark, root, "main", v0)
    val files0 = SnapshotStore.manifestFiles(spark, root)
    // creating two branches wrote NO manifests and NO data
    assert(SnapshotStore.snapshots(spark, root) == Seq(v0))
    val expId = SnapshotStore.appendToBranch(
      Seq((10L, "x")).toDF("id", "seg"), root, "exp")
    // exp sees base + its plant; main still sees exactly v0's files
    assert(SnapshotStore.readBranch(spark, root, "exp")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 10L))
    assert(SnapshotStore.readBranch(spark, root, "main")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // branch commit extends the branch LINEAGE: its manifest carries
    // v0's files by reference plus only the new parts
    assert(SnapshotStore.manifestFiles(spark, root, Some(expId))
      .toSet.intersect(files0.toSet) == files0.toSet)
    // a commit on main after exp's claims the NEXT global id, and the
    // two lineages never see each other
    val mainId = SnapshotStore.appendToBranch(
      Seq((20L, "y")).toDF("id", "seg"), root, "main")
    assert(mainId == expId + 1)
    assert(SnapshotStore.readBranch(spark, root, "exp")
      .filter(col("id") === 20L).count() == 0)
    // fast-forward: release jumps to exp's validated head, 0 data moved
    SnapshotStore.createBranch(spark, root, "release", v0)
    SnapshotStore.fastForward(spark, root, "release", "exp")
    assert(SnapshotStore.branchHead(spark, root, "release")
      .contains(expId))
    assert(SnapshotStore.readBranch(spark, root, "release")
      .select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 10L))
    // duplicate create must fail atomically
    intercept[IllegalStateException] {
      SnapshotStore.createBranch(spark, root, "exp", v0)
    }
    // and the failed create didn't clobber the existing ref
    assert(SnapshotStore.branchHead(spark, root, "exp").contains(expId))
  }

  test("restore: metadata-only rollback, mistake stays time-travelable") {
    import spark.implicits._
    val root = freshRoot()
    val v0Data = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("id", "v")
    val v0 = SnapshotStore.commit(v0Data, root)
    val files0 = SnapshotStore.manifestFiles(spark, root)
    SnapshotStore.commit(v0Data.filter(col("id") =!= 2L), root) // oops
    val v2 = SnapshotStore.restore(spark, root, v0)
    // rollback pins v0's EXACT files — no data written, pure metadata
    assert(SnapshotStore.manifestFiles(spark, root) == files0)
    assert(v2 == v0 + 2)
    assert(SnapshotStore.read(spark, root)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // the mistaken snapshot remains readable for the post-mortem
    assert(SnapshotStore.readSnapshot(spark, root, Some(v0 + 1))
      .count() == 2)
  }

  test("appendCommit/readEvolved: column add is O(new data), history " +
      "keeps the narrow schema, old rows read the new column as null") {
    import spark.implicits._
    val root = freshRoot()
    val v0 = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal")
    val id0 = SnapshotStore.commit(v0, root)
    val files0 = SnapshotStore.manifestFiles(spark, root)

    val v1 = Seq((3L, 30.0, "gold"), (4L, 40.0, "dust"))
      .toDF("id", "bal", "tier")
    val id1 = SnapshotStore.appendCommit(v1, root)
    val files1 = SnapshotStore.manifestFiles(spark, root)
    // carried BY REFERENCE: snapshot 0's files are a strict prefix
    // subset of snapshot 1's — no rewrite for a column add
    assert(files0.toSet.subsetOf(files1.toSet) &&
      files1.size > files0.size)

    val evolved = SnapshotStore.readEvolved(spark, root)
    assert(evolved.columns.sorted.toSeq == Seq("bal", "id", "tier"))
    val byId = evolved.collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("tier")))
      .toMap
    assert(byId == Map(1L -> None, 2L -> None,
      3L -> Some("gold"), 4L -> Some("dust")))

    // time travel: the pre-evolution snapshot still has ONLY its own
    // columns — evolution never rewrote history
    assert(SnapshotStore.readSnapshot(spark, root, Some(id0))
      .columns.sorted.toSeq == Seq("bal", "id"))
    assert(id1 == id0 + 1)

    // a DV delete layered on the evolved table still reads clean
    SnapshotStore.deleteWhere(spark, root, col("id") === 3L)
    assert(SnapshotStore.readEvolved(spark, root)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
  }

  test("deleteWhere: no data file is rewritten; reads drop dead rows; " +
      "time travel sees them; re-delete is a no-op") {
    val root = freshRoot()
    val base = spark.range(0, 1000L)
      .select(col("id"), (col("id") * 2).as("v"))
    val id0 = SnapshotStore.commit(base.repartition(4), root)
    val filesBefore = SnapshotStore.manifestFiles(spark, root)

    val id1 = SnapshotStore.deleteWhere(spark, root, col("id") % 10 === 3)
    // merge-on-read: the data file set is bit-identical (same names)
    assert(SnapshotStore.manifestFiles(spark, root) == filesBefore)
    assert(SnapshotStore.read(spark, root).count() == 900)
    assert(SnapshotStore.read(spark, root)
      .filter(col("id") % 10 === 3).count() == 0)
    // pre-delete snapshot still has every row (time travel)
    assert(SnapshotStore.readSnapshot(spark, root, Some(id0))
      .count() == 1000)
    // idempotence: nothing left to match → no new snapshot
    assert(SnapshotStore.deleteWhere(spark, root,
      col("id") % 10 === 3) == id1)
  }

  test("deleteWhere: sidecars merge cumulatively and compaction " +
      "materializes deletes without resurrecting rows") {
    val root = freshRoot()
    val base = spark.range(0, 2000L)
      .select(col("id"), (col("id") % 7).as("v"))
    // fragmented layout so compact has a small-file tail to rewrite
    SnapshotStore.commit(base.repartition(16), root)
    SnapshotStore.deleteWhere(spark, root, col("id") < 100)
    SnapshotStore.deleteWhere(spark, root, col("id") >= 1900)
    // one merged DV serves both deletes
    assert(SnapshotStore.dvPaths(spark, root).length == 1)
    assert(SnapshotStore.read(spark, root).count() == 1800)

    SnapshotStore.compact(spark, root, targetBytes = 1L << 20)
    val after = SnapshotStore.read(spark, root)
    assert(after.count() == 1800)
    assert(after.filter(col("id") < 100 || col("id") >= 1900)
      .count() == 0)
    // every small file was rewritten → deletes are materialized and
    // the carried DV vanished with them
    assert(SnapshotStore.dvPaths(spark, root).isEmpty)
  }

  test("vacuum keeps a live DV sidecar; readers stay correct after") {
    val root = freshRoot()
    SnapshotStore.commit(
      spark.range(0, 500L).select(col("id")).repartition(2), root)
    SnapshotStore.deleteWhere(spark, root, col("id") % 5 === 0)
    assert(SnapshotStore.vacuum(spark, root, keepLast = 1,
      minAgeMs = 0) == 0)
    assert(SnapshotStore.read(spark, root).count() == 400)
  }

  test("OCC: racing appenders never lose an update") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commit(Seq(0L).toDF("id"), root)
    // 8 threads race the same rename-if-absent commit; the rebase
    // loop must fold every loser's files onto the winner's manifest
    val n = 8
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    // a start latch releases every appender at once: each thread
    // pre-writes its data files, then all hit the publish race in
    // the same instant — the widest window for the local-rename
    // overwrite bug renameIfAbsent closes (rename(2) replaces an
    // existing destination; link(2) fails with EEXIST)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to n).map { w =>
      new Thread(() => {
        try {
          gate.await()
          SnapshotStore.appendCommit(Seq(w.toLong).toDF("id"), root)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); gate.countDown()
    threads.foreach(_.join())
    assert(errs.isEmpty, s"appender failed: ${errs.peek()}")
    assert(SnapshotStore.read(spark, root)
      .as[Long].collect().sorted.toSeq == (0L to n.toLong))
    // one snapshot per append: ids 0..n all committed
    assert(SnapshotStore.snapshots(spark, root) == (0L to n.toLong))
  }

  test("OCC: a rewrite whose inputs were concurrently removed aborts") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commit(
      spark.range(0, 400L).select(col("id")).repartition(4), root)
    val v0Files = SnapshotStore.manifestFiles(spark, root)
    // a concurrent OPTIMIZE rewrites every v0 file...
    SnapshotStore.compact(spark, root, targetBytes = 1L << 20)
    assert(SnapshotStore.manifestFiles(spark, root)
      .toSet.intersect(v0Files.toSet).isEmpty)
    // ...so a rewrite derived from a v0 file must refuse to commit
    // (its outputs reference data that no longer exists)
    intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commitRewrite(spark, root,
        required = Set.empty, removed = Set(v0Files.head),
        added = Seq.empty, maxRetries = 10)
    }
    // and one pinning still-live inputs (required) + a pure append
    // payload sails through, carrying the compacted base
    val live = SnapshotStore.manifestFiles(spark, root)
    SnapshotStore.commitRewrite(spark, root,
      required = live.toSet, removed = Set.empty,
      added = Seq.empty, maxRetries = 10)
    assert(SnapshotStore.read(spark, root).count() == 400)
  }

  test("statsQuery answers from metadata alone — even with the data gone") {
    val root = freshRoot()
    val df = spark.range(1, 1001L)
      .select(col("id"), (col("id") * 3).as("v"))
    SnapshotStore.commitWithStats(
      df.repartitionByRange(4, col("id")), root, "id")
    def answer() = {
      val r = SnapshotStore.statsQuery(spark, root, "id").head()
      (r.getLong(0), r.getString(1).toLong, r.getString(2).toLong)
    }
    assert(answer() == ((1000L, 1L, 1000L)))
    // the proof no scan happens: physically delete every data file;
    // the manifest-only answer must not notice
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    SnapshotStore.manifestFiles(spark, root).foreach { p =>
      assert(fs.delete(new org.apache.hadoop.fs.Path(p), false))
    }
    assert(answer() == ((1000L, 1L, 1000L)))
    // numeric fold, not lexical: min must be 1, not "1000" < "99"
    assert(answer()._2 == 1L && answer()._3 == 1000L)
  }

  test("ndvQuery answers from metadata alone; exact under-full, " +
    "enveloped in the sketch regime; plain manifests refused") {
    import graft.ops.KmvSketch
    // bounded domain (100 < k): NDV is exact, and survives deleting
    // every data file — the statsQuery metadata-only proof
    val root = freshRoot()
    SnapshotStore.commitWithNdv(
      spark.range(1, 1001L).select((col("id") % 100).as("key"))
        .repartitionByRange(4, col("key")), root, "key")
    def answer() = SnapshotStore.ndvQuery(spark, root, "key")
    assert(answer() == ((1000L, 100.0)))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    SnapshotStore.manifestFiles(spark, root).foreach { p =>
      assert(fs.delete(new org.apache.hadoop.fs.Path(p), false))
    }
    assert(answer() == ((1000L, 100.0)),
      "NDV must come from the manifest, not a data scan")
    // sketch regime (20k distinct >> k=256): estimate inside the
    // 4-sigma 1/sqrt(k-2) envelope of the true distinct count
    val big = freshRoot()
    SnapshotStore.commitWithNdv(
      spark.range(0, 20000L).select(col("id").as("key"))
        .repartition(4), big, "key")
    val (n, d) = SnapshotStore.ndvQuery(spark, big, "key")
    assert(n == 20000L)
    val tol = 4.0 / math.sqrt(KmvSketch.K - 2.0)
    assert(math.abs(d - 20000.0) / 20000.0 < tol,
      s"NDV estimate $d for 20000 distinct")
    // a plain commit has no sketch field: loud, not silent
    val plain = freshRoot()
    SnapshotStore.commit(spark.range(0, 10L).select(col("id")), plain)
    intercept[IllegalStateException] {
      SnapshotStore.ndvQuery(spark, plain, "id")
    }
  }

  test("CHECK constraints: born-broken declarations refused, NULL " +
    "passes, violating batches rejected whole, names survive a scan") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commit(
      Seq((1L, 5.0), (2L, 10.0)).toDF("id", "qty"), root)
    // a declaration the CURRENT data violates must fail (Delta
    // semantics: a constraint is never born broken)...
    intercept[IllegalStateException] {
      SnapshotStore.addConstraint(spark, root, "qty_big", "qty > 7")
    }
    assert(SnapshotStore.constraintsOf(spark, root).isEmpty)
    // ...a satisfiable one sticks, and duplicates are loud
    SnapshotStore.addConstraint(spark, root, "qty_positive", "qty > 0")
    intercept[IllegalStateException] {
      SnapshotStore.addConstraint(spark, root, "qty_positive", "qty > 0")
    }
    // SQL CHECK semantics: NULL passes (that is what NOT NULL is for)
    SnapshotStore.checkedAppend(
      Seq((3L, Option.empty[Double])).toDF("id", "qty"), root)
    assert(SnapshotStore.read(spark, root).count() == 3)
    // a violating batch is rejected WHOLE — including its clean rows
    val e = intercept[IllegalStateException] {
      SnapshotStore.checkedAppend(
        Seq((4L, 2.0), (5L, -1.0)).toDF("id", "qty"), root)
    }
    assert(e.getMessage.contains("qty_positive (1 rows)"))
    assert(SnapshotStore.read(spark, root).count() == 3,
      "a rejected batch must leave the table untouched")
    // the declaration is durable store state, not session state
    assert(SnapshotStore.constraintsOf(spark, root)
      == Map("qty_positive" -> "qty > 0"))
  }

  test("vacuum never reaps constraint declarations; enforcement " +
    "survives the reclaim") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commit(Seq((1L, 5.0)).toDF("id", "qty"), root)
    SnapshotStore.addConstraint(spark, root, "qty_positive", "qty > 0")
    SnapshotStore.checkedAppend(Seq((2L, 7.0)).toDF("id", "qty"), root)
    // a full REPLACEMENT commit makes the earlier snapshots' data
    // dirs dead, so the vacuum genuinely reclaims (its return counts
    // dead data dirs — appends alone share theirs forward)
    SnapshotStore.commit(
      Seq((1L, 5.0), (2L, 7.0), (3L, 9.0)).toDF("id", "qty"), root)
    assert(SnapshotStore.vacuum(spark, root, keepLast = 1,
      minAgeMs = 0L) > 0, "fixture: vacuum must reclaim something")
    assert(SnapshotStore.constraintsOf(spark, root)
      == Map("qty_positive" -> "qty > 0"),
      "vacuum must not touch the constraints dir")
    intercept[IllegalStateException] {
      SnapshotStore.checkedAppend(
        Seq((4L, -1.0)).toDF("id", "qty"), root)
    }
    assert(SnapshotStore.read(spark, root).count() == 3)
  }

  test("EVERY new-row write verb enforces declared constraints — " +
    "no unchecked write can void the O(batch) invariant") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commit(Seq((1L, 5.0)).toDF("id", "qty"), root)
    SnapshotStore.addConstraint(spark, root, "qty_positive", "qty > 0")
    // plain appendCommit: validated, rejected whole
    intercept[IllegalStateException] {
      SnapshotStore.appendCommit(Seq((2L, -1.0)).toDF("id", "qty"), root)
    }
    // full-replacement commit: validated too (Delta semantics)
    intercept[IllegalStateException] {
      SnapshotStore.commit(Seq((2L, -1.0)).toDF("id", "qty"), root)
    }
    // stats/NDV-bearing commits: same gate
    intercept[IllegalStateException] {
      SnapshotStore.commitWithStats(
        Seq((2L, -1.0)).toDF("id", "qty"), root, "id")
    }
    intercept[IllegalStateException] {
      SnapshotStore.commitWithNdv(
        Seq((2L, -1.0)).toDF("id", "qty"), root, "id")
    }
    // branch appends: branch rows are still table rows
    SnapshotStore.createBranch(spark, root, "audit",
      SnapshotStore.latestId(spark, root))
    intercept[IllegalStateException] {
      SnapshotStore.appendToBranch(
        Seq((2L, -1.0)).toDF("id", "qty"), root, "audit")
    }
    assert(SnapshotStore.read(spark, root).count() == 1,
      "every rejected write must leave the table untouched")
    // clean writes still pass through each verb
    SnapshotStore.appendCommit(Seq((2L, 7.0)).toDF("id", "qty"), root)
    assert(SnapshotStore.read(spark, root).count() == 2)
  }

  test("commitWithNdv excludes NULLs from the sketch — NDV keeps " +
    "COUNT(DISTINCT) semantics while cnt counts all rows") {
    import spark.implicits._
    val root = freshRoot()
    // 100 distinct non-null keys + 50 null rows in one frame
    SnapshotStore.commitWithNdv(
      spark.range(0, 150L).select(
        when(col("id") < 100, col("id") % 100)
          .otherwise(lit(null)).as("key"))
        .repartition(4), root, "key")
    val (n, d) = SnapshotStore.ndvQuery(spark, root, "key")
    assert(n == 150L, "row count includes null rows")
    assert(d == 100.0,
      s"under-full NDV must be the exact non-null distinct count, got $d")
  }

  test("statsQuery refuses DV snapshots and plain manifests") {
    val root = freshRoot()
    SnapshotStore.commitWithStats(
      spark.range(0, 100L).select(col("id")), root, "id")
    SnapshotStore.deleteWhere(spark, root, col("id") < 10)
    intercept[IllegalArgumentException] {
      SnapshotStore.statsQuery(spark, root, "id")
    }
    val plain = freshRoot()
    SnapshotStore.commit(spark.range(0, 10L).select(col("id")), plain)
    intercept[IllegalStateException] {
      SnapshotStore.statsQuery(spark, plain, "id")
    }
  }

  test("WAP: a failed audit leaves main untouched and the stage for triage") {
    import spark.implicits._
    import graft.ops.Expectations
    val root = freshRoot()
    val clean = Seq((1L, 5.0, 0.05, "N"), (2L, 10.0, 0.0, "R"))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_returnflag")
    val v0 = SnapshotStore.commit(clean, root)
    SnapshotStore.createBranch(spark, root, "main", v0)
    // stage a dirty batch (violates quantity_range), audit, withhold
    SnapshotStore.createBranch(spark, root, "stage", v0)
    SnapshotStore.appendToBranch(
      Seq((3L, -4.0, 0.02, "A"))
        .toDF("l_orderkey", "l_quantity", "l_discount", "l_returnflag"),
      root, "stage")
    val audit = Expectations.summarize(
      SnapshotStore.readBranch(spark, root, "stage"),
      Expectations.lineitemExpectations)
    assert(audit.select("n_quarantined").head().getLong(0) == 1L)
    // publish withheld → main still reads exactly the base
    assert(SnapshotStore.readBranch(spark, root, "main")
      .select("l_orderkey").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // the stage stays addressable for triage, violation row included
    assert(SnapshotStore.readBranch(spark, root, "stage").count() == 3)
  }

  test("vacuum pins the trunk head when branch commits top the log") {
    import spark.implicits._
    val root = freshRoot()
    val v0 = SnapshotStore.commit(Seq(1L, 2L).toDF("id"), root)
    SnapshotStore.createBranch(spark, root, "stage", v0)
    // the newest GLOBAL ids are all branch commits...
    SnapshotStore.appendToBranch(Seq(100L).toDF("id"), root, "stage")
    SnapshotStore.appendToBranch(Seq(101L).toDF("id"), root, "stage")
    // ...so a keepLast=1 window alone would reclaim the trunk head
    SnapshotStore.vacuum(spark, root, keepLast = 1, minAgeMs = 0)
    assert(SnapshotStore.read(spark, root).as[Long].collect().sorted
      .toSeq == Seq(1L, 2L), "trunk head must survive the reclaim")
    // and a later trunk append extends it, not an empty base
    SnapshotStore.appendCommit(Seq(3L).toDF("id"), root)
    assert(SnapshotStore.read(spark, root).as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L))
  }

  test("readAsOf travels the trunk only, never a staged branch") {
    import spark.implicits._
    val root = freshRoot()
    val v0 = SnapshotStore.commit(Seq(1L).toDF("id"), root)
    SnapshotStore.createBranch(spark, root, "stage", v0)
    SnapshotStore.appendToBranch(Seq(666L).toDF("id"), root, "stage")
    // "now" is after the staged (possibly unaudited) branch commit,
    // but unqualified time travel must resolve the trunk head
    val got = SnapshotStore
      .readAsOf(spark, root, System.currentTimeMillis() + 60000)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L), s"staged rows leaked into readAsOf: $got")
  }

  test("shallow clone copies no data and rewrites stay independent") {
    import spark.implicits._
    val root = freshRoot()
    val src = s"$root/src"
    val dst = s"$root/clone"
    SnapshotStore.commit(
      spark.range(0, 400L).select(col("id")).repartition(4), src)
    SnapshotStore.cloneTable(spark, src, dst)
    // zero-copy: the clone has NO data directory of its own yet
    assert(!java.nio.file.Files.exists(
      java.nio.file.Path.of(dst, "data")),
      "a shallow clone must not copy data files")
    assert(SnapshotStore.read(spark, dst).count() == 400)
    // a rewrite on the clone writes NEW files; the source still reads
    // its originals (immutable shared files, independent manifests)
    SnapshotStore.deleteWhere(spark, dst, col("id") < 100L)
    assert(SnapshotStore.read(spark, dst).count() == 300)
    assert(SnapshotStore.read(spark, src).count() == 400)
    // and a source append never leaks into the clone
    SnapshotStore.appendCommit(Seq(9999L).toDF("id"), src)
    assert(SnapshotStore.read(spark, src).count() == 401)
    assert(SnapshotStore.read(spark, dst).count() == 300)
  }

  test("trunk and branch lineages stay isolated under interleaving") {
    import spark.implicits._
    val root = freshRoot()
    val v0 = SnapshotStore.commit(Seq(1L, 2L).toDF("id"), root)
    SnapshotStore.createBranch(spark, root, "stage", v0)
    // a branch commit takes the next GLOBAL id...
    SnapshotStore.appendToBranch(Seq(100L).toDF("id"), root, "stage")
    // ...but an unqualified read still resolves the TRUNK head
    assert(SnapshotStore.read(spark, root).as[Long].collect().sorted
      .toSeq == Seq(1L, 2L))
    // a trunk append AFTER the branch commit extends the trunk, not
    // the branch lineage the id race would otherwise hand it
    SnapshotStore.appendCommit(Seq(3L).toDF("id"), root)
    assert(SnapshotStore.read(spark, root).as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L))
    // the branch still sees base + its own commit and nothing else
    assert(SnapshotStore.readBranch(spark, root, "stage")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 100L))
  }

  test("a rewrite aborts when a concurrent delete's DV landed unseen") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commit(
      spark.range(0, 100L).select(col("id")).repartition(2), root)
    val lines = SnapshotStore.manifestFiles(spark, root)
    // a merge-on-read delete lands AFTER a rewrite read its inputs
    SnapshotStore.deleteWhere(spark, root, col("id") < 10L)
    // the rewrite derived its outputs without the DV's dead
    // positions: committing would resurrect the deleted rows
    intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commitRewrite(spark, root,
        required = lines.toSet, removed = lines.toSet,
        added = Seq.empty, maxRetries = 10)
    }
    assert(SnapshotStore.read(spark, root).count() == 90)
  }

  test("vacuum keeps ref'd manifests however old their ids are") {
    import spark.implicits._
    val root = freshRoot()
    val v0 = SnapshotStore.commit(Seq(1L).toDF("id"), root)
    SnapshotStore.createBranch(spark, root, "pin", v0)
    SnapshotStore.commit(Seq(2L).toDF("id"), root) // v1 overwrite
    SnapshotStore.commit(Seq(3L).toDF("id"), root) // v2 overwrite
    SnapshotStore.vacuum(spark, root, keepLast = 1, minAgeMs = 0)
    // v0 is older than keepLast but a ref points at it: both the
    // manifest and its data must survive the reclaim
    assert(SnapshotStore.readBranch(spark, root, "pin")
      .as[Long].collect().toSeq == Seq(1L))
    assert(SnapshotStore.read(spark, root).as[Long].collect()
      .toSeq == Seq(3L))
  }

  test("latest.hint accelerates resolution and never lies") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commit(Seq(1L).toDF("id"), root)
    SnapshotStore.appendCommit(Seq(2L).toDF("id"), root)
    val hint = java.nio.file.Path.of(root, "latest.hint")
    // a successful commit leaves the hint at the latest id
    assert(java.nio.file.Files.readString(hint).trim == "1")
    assert(SnapshotStore.latestId(spark, root) == 1L)
    // stale hint (crashed writer, slow overwrite): forward probing
    // finds the real latest
    java.nio.file.Files.writeString(hint, "0\n")
    assert(SnapshotStore.latestId(spark, root) == 1L)
    // corrupt hint: fall back to the listing
    java.nio.file.Files.writeString(hint, "not-a-number\n")
    assert(SnapshotStore.latestId(spark, root) == 1L)
    // hint ahead of any real manifest (regressed then vacuumed, or
    // torn write): only real manifests are believed
    java.nio.file.Files.writeString(hint, "99\n")
    assert(SnapshotStore.latestId(spark, root) == 1L)
    // missing hint entirely: listing fallback, and the next commit
    // restores it
    java.nio.file.Files.delete(hint)
    assert(SnapshotStore.latestId(spark, root) == 1L)
    SnapshotStore.appendCommit(Seq(3L).toDF("id"), root)
    assert(java.nio.file.Files.readString(hint).trim == "2")
    assert(SnapshotStore.read(spark, root).as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L))
  }

  test("latestId survives a vacuum mid-log gap with a regressed hint " +
      "— no id reclaim, no forked log") {
    import spark.implicits._
    val root = freshRoot()
    val v0 = SnapshotStore.commit(Seq(1L).toDF("id"), root)
    SnapshotStore.createBranch(spark, root, "pin", v0) // pins id 0
    SnapshotStore.commit(Seq(2L).toDF("id"), root)     // id 1
    SnapshotStore.commit(Seq(3L).toDF("id"), root)     // id 2
    SnapshotStore.commit(Seq(4L).toDF("id"), root)     // id 3
    // vacuum deletes unpinned ids 1,2 ABOVE the pinned id 0 →
    // the manifest log is now gapped: {0, 3}
    SnapshotStore.vacuum(spark, root, keepLast = 1, minAgeMs = 0)
    assert(SnapshotStore.snapshots(spark, root) == Seq(0L, 3L))
    // simulate the slow-writer hint regression the non-atomic
    // delete+rename permits: the hint lags to the PINNED id below
    // the gap — the forward probe from 0 stops at the gap
    val hint = java.nio.file.Path.of(root, "latest.hint")
    java.nio.file.Files.writeString(hint, "0\n")
    // the vacuum floor marks ids ≤ 2 as gap-suspect → listing wins
    assert(SnapshotStore.latestId(spark, root) == 3L)
    // and the next commit claims a FRESH id (4), never reclaiming a
    // vacuumed one (1) — which would fork the log between
    // listing-based readers and hint-based writers
    val next = SnapshotStore.commit(Seq(5L).toDF("id"), root)
    assert(next == 4L, s"commit reclaimed a vacuumed id: $next")
    assert(SnapshotStore.read(spark, root).as[Long].collect()
      .toSeq == Seq(5L))
    // vacuum also refreshed the hint to the head while it had the
    // listing; the regression above was synthetic — a fresh read of
    // the store must see the new head through the hint fast path
    assert(java.nio.file.Files.readString(hint).trim == "4")
  }

  test("fastForward refuses to mint a branch for a typo'd target") {
    import spark.implicits._
    val root = freshRoot()
    val v0 = SnapshotStore.commit(Seq(1L).toDF("id"), root)
    SnapshotStore.createBranch(spark, root, "exp", v0)
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.fastForward(spark, root, "relaese", "exp")
    }
    assert(e.getMessage.contains("relaese"))
    // no ref file was created by the failed publish
    assert(!java.nio.file.Files.exists(
      java.nio.file.Path.of(root, "refs", "relaese")))
  }

  test("s32 recluster: stats prune after, not before; history intact") {
    val root = freshRoot()
    SnapshotStore.commit(spark.range(0, 4000L)
      .select(col("id").as("x"), (col("id") * 7919 % 4000).as("y"))
      .repartition(8), root)
    // v0 is a plain scattered commit: no stats, nothing prunes
    assert(SnapshotStore.pruneFiles(spark, root, "x", 0L, 499L,
      Some(0L))._1.length == 8)
    SnapshotStore.optimizeZorder(spark, root, "x", "y",
      numFiles = 8, statsCol = "x")
    // 8 z-range files: the top Morton bits interleave y and x, so a
    // 1/8th x band excludes at least the x-msb=1 half of the files
    // (range-sampled boundaries may leave one straddling file)
    val (kept, total) = SnapshotStore.pruneFiles(spark, root, "x",
      0L, 499L)
    assert(total == 8 && kept.length <= 5,
      s"expected x-band pruning, kept ${kept.length}/$total")
    // content preserved exactly; the scattered v0 stays travelable
    assert(SnapshotStore.read(spark, root).count() == 4000)
    assert(SnapshotStore.readSnapshot(spark, root, Some(0L))
      .count() == 4000)
    assert(SnapshotStore.readPruned(spark, root, "x", 100L, 199L)
      .count() == 100)
  }

  test("s31: manifest row count drives the broadcast decision both ways") {
    import spark.implicits._
    val base = freshRoot()
    val custRoot = s"$base/customer"
    val ordRoot = s"$base/orders"
    // small side: well under the threshold → broadcast build
    SnapshotStore.commitWithStats(
      spark.range(0, 200L).select(col("id").as("c_custkey"),
        concat(lit("SEG"), col("id") % 3).as("c_mktsegment")),
      custRoot, "c_custkey")
    SnapshotStore.commitWithStats(
      spark.range(0, 2000L).select(col("id").as("o_orderkey"),
        (col("id") % 200).as("o_custkey")),
      ordRoot, "o_custkey")
    val small = SnapshotStore.statsDrivenJoin(spark, custRoot, ordRoot)
    val planSmall = small.queryExecution.executedPlan.toString
    assert(planSmall.contains("BroadcastHashJoin"),
      s"expected a broadcast build under the row threshold:\n$planSmall")
    assert(small.agg(sum("n_orders")).head().getLong(0) == 2000L)

    // grow the small side's METADATA past the threshold (same join
    // keys — pad with never-matching negative keys so the result is
    // unchanged): the hint must be withheld and the planner keep a
    // shuffle join. autoBroadcastJoinThreshold is disabled so the
    // decision under test is the manifest one, not a size estimate.
    SnapshotStore.commitWithStats(
      spark.range(0, 200L).select(col("id").as("c_custkey"),
        concat(lit("SEG"), col("id") % 3).as("c_mktsegment"))
        .unionByName(spark.range(0,
          SnapshotStore.BroadcastRowThreshold).select(
          (-col("id") - 1).as("c_custkey"),
          lit("PAD").as("c_mktsegment"))),
      custRoot, "c_custkey")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = SnapshotStore.statsDrivenJoin(spark, custRoot, ordRoot)
      val planBig = big.queryExecution.executedPlan.toString
      assert(!planBig.contains("BroadcastHashJoin"),
        s"expected the broadcast hint withheld over the threshold:\n$planBig")
      assert(big.agg(sum("n_orders")).head().getLong(0) == 2000L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

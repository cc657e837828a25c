package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.CsvIO
import graft.streaming.{EventStreams, SessionEvent, Sessionize}

/** S3/S4 sink-source round trips and the stateful streaming
  * sessionizer's batch-parity contract. */
class SourcesSessionSpec extends SparkTestBase {

  test("s3: CSV round trip preserves data under a declared schema") {
    val src = Tables.orders(spark, sfSmoke)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val dir = Files.createTempDirectory("graft_csv").toString
    CsvIO.writeCsv(src, dir)
    val back = CsvIO.readCsv(spark, dir, src.schema)
    assert(back.exceptAll(src).count() == 0)
    assert(src.exceptAll(back).count() == 0)
  }

  test("s4: parquet round trip is lossless incl. timestamps") {
    val src = Tables.orders(spark, sfSmoke)
    val dir = Files.createTempDirectory("graft_pq").toString
    CsvIO.writeParquet(src, dir)
    val back = CsvIO.readParquet(spark, dir)
    assert(back.exceptAll(src).count() == 0)
    assert(src.exceptAll(back).count() == 0)
  }

  test("s3/s4 sink gates: round-tripped aggregate equals the in-memory " +
    "frame value-for-value") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
        .sorted.toSeq
    // the same payload the gates write, re-derived here
    val expected = canon(Tables.lineitem(spark, sfSmoke)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(graft.ops.Det.dsum2(col("l_quantity")).as("sum_qty"),
        graft.ops.Det.dsum2(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows")))
    assert(expected.nonEmpty)
    val csv = CsvIO.s3CsvRoundtrip(spark, sfSmoke)
    val pq = CsvIO.s4ParquetRoundtrip(spark, sfSmoke)
    assert(canon(csv) == expected, "CSV round trip bent a value")
    assert(canon(pq) == expected, "parquet round trip bent a value")
    assert(csv.schema == pq.schema, "declared vs carried schema drift")
  }

  test("s5 plot sink: PNGs decode back to the exact bar/box geometry") {
    import graft.sources.PlotSink
    // histogram leg: every measured bar equals the scaling arithmetic
    val out = PlotSink.s5PlotSink(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    val maxN = out.map(_.getLong(1)).max
    out.foreach { r =>
      assert(r.getInt(2) == PlotSink.barPx(r.getLong(1), maxN),
        s"bucket ${r.getLong(0)}: ${r.getInt(2)} px") }
    // boxplot leg: decoded feature columns land at the scaled x's
    val dir = Files.createTempDirectory("graft-plot").toString
    val paths = PlotSink.plotColumns(spark, Tables.orders(spark, sfSmoke),
      Seq("o_totalprice"), dir)
    assert(paths.forall(p => new java.io.File(p).length > 0))
    val st = Tables.orders(spark, sfSmoke).agg(
      min(col("o_totalprice")).cast("double"),
      expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))"),
      max(col("o_totalprice")).cast("double")).head()
    val (mn, mx) = (st.getDouble(0), st.getDouble(2))
    val qs = st.getSeq[Double](1)
    def px(v: Double): Int = PlotSink.Margin +
      math.floor((v - mn) / (mx - mn) * (PlotSink.TrackW - 1) + 0.5).toInt
    val (boxCols, med) = PlotSink.measureBox(s"$dir/o_totalprice_box.png")
    assert(med == px(qs(1)), s"median tick at $med, expected ${px(qs(1))}")
    assert(boxCols.contains(px(qs(0))) && boxCols.contains(px(qs(2))),
      s"box verticals $boxCols miss q1/q3 at ${px(qs(0))}/${px(qs(2))}")
  }

  test("s7: partitioned write prunes partitions on read") {
    val src = Tables.orders(spark, sfSmoke)
    val dir = Files.createTempDirectory("graft_part").toString
    CsvIO.writePartitioned(src, dir,
      partCols = Seq("o_orderstatus"), sortCols = Seq("o_orderdate"))
    // hive layout: one directory per status value
    val subdirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs.exists(_.startsWith("o_orderstatus=")))
    // round trip (partition col comes back, possibly reordered)
    val back = CsvIO.readParquet(spark, dir)
      .select(src.columns.map(col).toIndexedSeq: _*)
    assert(back.exceptAll(src).count() == 0)
    assert(src.exceptAll(back).count() == 0)
    // a partition-key predicate must prune at the scan, not filter rows
    val pruned = CsvIO.readParquet(spark, dir)
      .filter(col("o_orderstatus") === "F")
    val scanLine = pruned.queryExecution.executedPlan.toString
    assert(scanLine.contains("PartitionFilters"), scanLine)
    assert(pruned.count() ==
      src.filter(col("o_orderstatus") === "F").count())
  }

  test("merge(): gap splits, accumulation, and open-session carry") {
    val ev = (ts: Long) => SessionEvent(1L, ts, ts, 1.0)
    val (closed, open) = Sessionize.merge(1L,
      Seq(ev(0), ev(1000), ev(1000 + Sessionize.GapUs + 1)), None)
    assert(closed.map(c => (c.n_events, c.duration_us)) == Seq((2L, 1000L)))
    assert(open.exists(_.n_events == 1))
    // feeding the carry into a next batch continues the open session
    val (closed2, open2) = Sessionize.merge(1L,
      Seq(ev(1000 + Sessionize.GapUs + 2000)), open)
    assert(closed2.isEmpty && open2.exists(_.n_events == 2))
  }

  test("stateful streaming sessions == batch sessions minus open tails") {
    import spark.implicits._
    val q = Sessionize.sessionStream(spark, sfSmoke)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    try q.processAllAvailable() finally q.stop()
    // batch sum_value is Det.r2-rounded; round the streamed one too
    // (summation order differs: ts-order fold vs hash-agg order)
    val streamed = spark.table("sessions_out")
      .select(col("user_id"), col("n_events"), col("duration_us"),
        ops.Det.r2(col("sum_value")).as("sum_value"))
    // Batch e3 minus each user's OPEN tail. With EventTimeTimeout a
    // user's final session is only still open if the final watermark
    // (max event time − 1 h) has not yet passed its last event + gap;
    // otherwise the timeout fired (in the no-data batch the watermark
    // advance triggers) and the tail was emitted too.
    val events = Tables.events(spark, sfSmoke)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val wmUs = events.agg(max("ts_us")).head().getLong(0) -
      3600L * 1000000
    val openUsers = events.groupBy("user_id")
      .agg(max("ts_us").as("last_us"))
      // timeout fires when floor((last+gap)/1000) ms < watermark ms;
      // floor(x/1000) >= k  ⟺  x >= 1000k, so compare in micros
      .filter(col("last_us") + Sessionize.GapUs >=
        lit((wmUs / 1000) * 1000))
      .select("user_id")
    val batch = EventStreams.e3StreamSession(spark, sfSmoke)
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_id").as("session_id"))
      .join(openUsers, Seq("user_id"), "left_semi")
    val closedBatch = batch.join(lastPerUser,
        Seq("user_id", "session_id"), "left_anti")
      .select("user_id", "n_events", "duration_us", "sum_value")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(closedBatch).count() == 0)
    assert(closedBatch.exceptAll(streamed).count() == 0)
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_orc").toString
    val orders = Tables.orders(spark, sfSmoke)
    sources.CsvIO.writeOrc(orders, s"$dir/orders")
    val back = sources.CsvIO.readOrc(spark, s"$dir/orders")
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).count() == 0)
    // the same data-skipping contract as parquet: the predicate
    // reaches the ORC scan as a pushed filter
    val filtered = back.filter(org.apache.spark.sql.functions
      .col("o_orderkey") === 42L)
    val scanDesc = filtered.queryExecution.executedPlan.toString
    assert(scanDesc.contains("PushedFilters") &&
      scanDesc.contains("o_orderkey"), s"no pushdown in:\n$scanDesc")
  }

  test("jsonl round-trip preserves the documents table; corrupt lines quarantine") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_jsonl").toString
    val docs = Tables.documents(spark, sfSmoke)
    sources.CsvIO.writeJsonl(docs, s"$dir/docs")
    val back = sources.CsvIO.readJsonl(spark, s"$dir/docs", docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0)
    // a corrupt line quarantines into _corrupt_record, not a job kill
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/bad.jsonl"),
      "{\"doc_id\": 1, \"text\": \"ok\"}\nnot json at all\n".getBytes)
    // Spark disallows querying only _corrupt_record straight off raw
    // files (SPARK-21610) — materialize the parse first
    val lenient = sources.CsvIO.readJsonl(spark, s"$dir/bad.jsonl",
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("_corrupt_record", StringType)))).cache()
    try {
      assert(lenient.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(lenient.filter(col("doc_id") === 1).count() == 1)
    } finally lenient.unpersist()
  }

  test("compaction rewrites many small files into few, data unchanged") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact").toString + "/t"
    val docs = Tables.documents(spark, sfSmoke)
      .select("doc_id", "n_chars")
    docs.repartition(24).write.parquet(dir) // simulate micro-batch accretion
    def parquetFiles() = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles() >= 24)
    sources.CsvIO.compact(spark, dir, 2)
    assert(parquetFiles() <= 2)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0)
  }

  test("mergeInto upserts in place: updates win, inserts land, rest persists") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_merge").toString + "/t"
    val target = Tables.customer(spark, sfSmoke)
      .select("c_custkey", "c_name", "c_acctbal")
    target.write.parquet(dir)
    val source = target.filter(col("c_custkey") <= 10)
      .withColumn("c_acctbal", lit(0.0))
      .union(target.filter(col("c_custkey") === 1)
        .withColumn("c_custkey", lit(999999L)))
    sources.MergeInto.mergeInto(spark, dir, source, "c_custkey")
    val back = spark.read.parquet(dir).cache()
    try {
      assert(back.count() == target.count() + 1)
      assert(back.filter(col("c_custkey") === 999999L).count() == 1)
      // all matched keys carry the source's zeroed balance
      assert(back.filter(col("c_custkey") <= 10 &&
        col("c_acctbal") =!= 0.0).count() == 0)
      // unmatched target rows are bit-identical to before the merge
      val untouched = back.filter(col("c_custkey") > 10 &&
        col("c_custkey") =!= 999999L)
      assert(untouched.exceptAll(
        target.filter(col("c_custkey") > 10)).count() == 0)
    } finally back.unpersist()
  }

  test("mergedView keeps a null-key source row intact (never all-NULLs)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val target = Seq((Some(1L), "t1"), (Some(2L), "t2"))
      .toDF("k", "v")
    // a null merge key never equi-joins: MERGE semantics file it as
    // not-matched → INSERT the source row as-is. Detecting "matched"
    // via s.k IS NOT NULL instead degenerates it to a row of NULLs.
    val source = Seq((Option.empty[Long], "orphan"), (Some(2L), "s2"))
      .toDF("k", "v")
    val out = sources.MergeInto.mergedView(target, source, "k")
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          Option(r.getString(1)))).toSet
    assert(out == Set((Some(1L), Some("t1")), (Some(2L), Some("s2")),
      (None, Some("orphan"))), s"got $out")
  }

  test("scd2Apply inserts a null-key change without touching history") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val hist = Seq((Some(1L), 10.0, 0L, Option.empty[Long], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val changes = Seq((Option.empty[Long], 99.0), (Some(1L), 10.0))
      .toDF("k", "attr")
    val out = sources.MergeInto.scd2Apply(hist, changes, "k", 5L)
    // unchanged row stays the sole current version of k=1; the
    // null-key change lands as its own new current row, and no
    // history row is rebuilt from the null source side
    val rows = out.collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getDouble(1), r.getBoolean(4))).toSet
    assert(rows == Set((Some(1L), 10.0, true), (None, 99.0, true)),
      s"got $rows")
  }

  test("mergeIntoPartitioned rewrites ONLY touched partitions, result = full merge") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft_pmerge").toString + "/t"
    val base = Tables.orders(spark, sfSmoke)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    sources.CsvIO.writePartitioned(base, root, Seq("o_orderpriority"))
    def fileState(p: String): Set[(String, Long)] = {
      val d = new java.io.File(p)
      if (!d.exists) Set.empty
      else d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified)).toSet
    }
    val untouchedBefore = Seq("1-URGENT", "3-MEDIUM", "4-NOT SPECIFIED")
      .map(v => fileState(s"$root/o_orderpriority=$v"))
    val changes = base
      .filter(col("o_orderpriority") === "2-HIGH" &&
        col("o_orderkey") % 20 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .union(base
        .filter(col("o_orderpriority") === "5-LOW" &&
          col("o_orderkey") % 100 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 5000000L))
    val touched = sources.MergeInto.mergeIntoPartitioned(
      spark, root, changes, "o_orderkey", "o_orderpriority")
    assert(touched == Seq("2-HIGH", "5-LOW"))
    // untouched partitions: identical files, identical mtimes —
    // never rewritten, which is the whole point of the pruning
    val untouchedAfter = Seq("1-URGENT", "3-MEDIUM", "4-NOT SPECIFIED")
      .map(v => fileState(s"$root/o_orderpriority=$v"))
    assert(untouchedBefore == untouchedAfter)
    assert(untouchedBefore.forall(_.nonEmpty))
    // and the table content equals the unpruned full-table merge
    val got = spark.read.parquet(root)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val want = sources.MergeInto.mergedView(base, changes, "o_orderkey")
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("mergeIntoPartitioned handles hive-escaped partition values") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_pmerge_esc").toString + "/t"
    // ':' hive-escapes to %3A on disk — a raw path build would miss
    // the dir, branch into brand-new-partition, and duplicate rows
    val base = Seq((1L, "X:Y", 10.0), (2L, "X:Y", 20.0),
      (3L, "plain", 30.0)).toDF("k", "p", "v")
    sources.CsvIO.writePartitioned(base, root, Seq("p"))
    val changes = Seq((2L, "X:Y", 25.0)).toDF("k", "p", "v")
    sources.MergeInto.mergeIntoPartitioned(spark, root, changes, "k", "p")
    val got = spark.read.parquet(root).select("k", "p", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(got == Set((1L, "X:Y", 10.0), (2L, "X:Y", 25.0),
      (3L, "plain", 30.0)),
      s"escaped-partition merge produced $got")
  }

  test("bloom-filter parquet write: footer carries the filter, reads stay exact") {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqbloom").toString + "/t"
    val docs = Tables.documents(spark, sfSmoke).select("doc_id", "n_chars")
    sources.CsvIO.writeWithBloomFilters(docs.coalesce(1), dir,
      Seq("doc_id"), expectedNdv = 1000L)
    // the footer must carry a bloom filter for doc_id and none for
    // the unlisted column
    val pq = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(pq.getAbsolutePath),
      spark.sessionState.newHadoopConf())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val chunks = reader.getFooter.getBlocks.get(0).getColumns.asScala
      val byName = chunks.map(c => c.getPath.toDotString -> c).toMap
      assert(byName("doc_id").getBloomFilterOffset > 0,
        "doc_id chunk should carry a bloom filter")
      assert(byName("n_chars").getBloomFilterOffset < 0,
        "unlisted column should carry none")
    } finally reader.close()
    // functional: a point lookup through the filtered scan is exact
    val id = docs.agg(min("doc_id")).head().getLong(0)
    val hit = spark.read.parquet(dir).filter(col("doc_id") === id)
    assert(hit.count() == 1)
  }

  test("scd2: changed keys version, no-op changes create nothing") {
    import org.apache.spark.sql.functions._
    val out = sources.MergeInto.s10Scd2(spark, sfSmoke).cache()
    try {
      // invariant: every key has exactly one current version
      assert(out.filter(col("is_current")).groupBy("c_custkey").count()
        .filter(col("count") =!= 1).count() == 0)
      // only balance-changed keys (%10) may carry two versions
      assert(out.groupBy("c_custkey").count()
        .filter(col("count") === 2)
        .filter(col("c_custkey") % 10 =!= 0).count() == 0)
      // a changed key's closed row ends exactly where the new begins
      val versions = out.filter(col("c_custkey") % 10 === 0 &&
        col("c_custkey") <= 2000000)
      assert(versions.filter(!col("is_current") &&
        col("valid_to") =!= 100L).count() == 0)
      assert(versions.filter(col("is_current") &&
        col("valid_from") =!= 100L).count() == 0)
      // the no-op slice (%30==5, disjoint from %10==0) stays 1 row
      assert(out.filter(col("c_custkey") % 30 === 5)
        .groupBy("c_custkey").count()
        .filter(col("count") =!= 1).count() == 0)
      // inserts arrive current, opening at the change time
      val ins = out.filter(col("c_custkey") > 2000000)
      assert(ins.count() > 0)
      assert(ins.filter(!col("is_current") ||
        col("valid_from") =!= 100L).count() == 0)
    } finally out.unpersist()
  }

  test("schema evolution: mergeSchema unions footers, old files read new cols as null") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_evolve").toString
    // pipeline v1 writes two columns; v2 adds a third
    Tables.nation(spark, sfSmoke).select("n_nationkey", "n_name")
      .write.parquet(s"$dir/part=v1")
    Tables.nation(spark, sfSmoke)
      .select(col("n_nationkey"), col("n_name"),
        lit("added").as("n_comment2"))
      .write.parquet(s"$dir/part=v2")
    val merged = sources.CsvIO.readParquetMerged(spark, dir)
    assert(merged.columns.toSet ==
      Set("n_nationkey", "n_name", "n_comment2", "part"))
    val n = Tables.nation(spark, sfSmoke).count()
    assert(merged.count() == 2 * n)
    // v1 rows surface the v2-only column as NULL; v2 rows carry it
    assert(merged.filter(col("part") === "v1" &&
      col("n_comment2").isNull).count() == n)
    assert(merged.filter(col("part") === "v2" &&
      col("n_comment2") === "added").count() == n)
  }
}

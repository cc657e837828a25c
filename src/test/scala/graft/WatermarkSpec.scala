package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Late-data semantics: with a 1-hour watermark in append mode, a
  * window only emits once the watermark passes its end, and events
  * arriving after that are dropped — exercised with a two-batch file
  * stream (batch 2 carries an on-time event that advances the
  * watermark AND a very late event for an already-finalized window). */
class WatermarkSpec extends SparkTestBase {

  test("append-mode watermark finalizes windows and drops late events") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wm").toString

    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("ts_us", "event_type")
        .select(timestamp_micros(col("ts_us")).as("ts"), col("event_type"))
        .coalesce(1).write.mode("append").parquet(dir)

    val h = 3600L * 1000000
    // batch 1: two events in hour-0, one in hour-5 (advances watermark to 4h)
    writeBatch("b1", Seq((10L * 60 * 1000000, "a"),
      (20L * 60 * 1000000, "a"), (5 * h + 1, "a")))

    val agg = spark.readStream
      .schema("ts timestamp, event_type string").parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"),
        col("event_type"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      q.processAllAvailable()
      // hour-0 window (end 1h <= watermark 4h) is finalized and emitted
      val after1 = spark.table("wm_out").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(after1.get(0L).contains(2L),
        s"hour-0 window should be final with 2 events, got $after1")

      // batch 2: a LATE event for hour-0 (behind the watermark — must
      // be dropped) and an hour-9 event (advances watermark further,
      // finalizing the hour-5 window)
      writeBatch("b2", Seq((30L * 60 * 1000000, "a"), (9 * h + 1, "a")))
      q.processAllAvailable()
      val after2 = spark.table("wm_out").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toMap
      // hour-0 stays at 2 — the late event did NOT re-open the window
      assert(after2.get(0L).contains(2L),
        s"late event must be dropped, got $after2")
      // hour-5 window finalized with its single event
      assert(after2.get(5 * h).contains(1L), s"hour-5 missing: $after2")
    } finally q.stop()
  }
}

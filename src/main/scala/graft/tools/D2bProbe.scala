package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-by-phase wall/spill probe for the d2b pair kernel (round-13
  * diagnosis): attributes the sf10 spill to a PHASE (explode,
  * df-count, survivor join, self-join+pair agg) instead of the whole
  * query, with the same task-metric counters Bench records.
  *
  * Usage: runMain graft.tools.D2bProbe <sfDir>
  */
object D2bProbe {
  private final class M extends SparkListener {
    val spill = new AtomicLong
    val sr = new AtomicLong
    val sw = new AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def drain(): (Long, Long, Long) = {
      val t = (spill.get, sr.get, sw.get)
      spill.set(0); sr.set(0); sw.set(0); t
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        "256")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4194304")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = new M
    spark.sparkContext.addSparkListener(m)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the async listener tail land
      val (sp, sr, sw) = m.drain()
      def mb(b: Long) = (b / 1048576.0).round
      println(f"D2BPROBE $label $sec%.1f s spill=${mb(sp)} MB " +
        s"sread=${mb(sr)} MB swrite=${mb(sw)} MB")
      r
    }

    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text")
    val exploded = graft.dedup.Dedup.shinglePairs(docs)
    t("explode-only")(exploded.count())
    val cap = graft.dedup.Dedup.StopShingleCap
    val groups = exploded.repartition(col("s")).groupBy("s")
      .agg(count(lit(1)).as("df"), collect_list(col("doc_id")).as("ids"))
      .filter(col("df") >= 2 && col("df") <= cap)
    t("s-agg+filter")(groups.count())
    val pairs = groups
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
             transform(slice(ids, i + 2, size(ids)),
               y -> struct(least(x, y) AS a, greatest(x, y) AS b))))"""))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    t("pair-explode+agg")(pairs.count())
    // round-14 (VERDICT r13 item 2): the two-level (shingle, salt)
    // pre-aggregation hypothesis, measured before building. Level 1
    // aggregates (s, salt-of-doc) partial lists; level 2 merges per
    // shingle. Counts are identical to the one-level agg (same
    // multiset of (s, doc) memberships; pair order never matters).
    // Expectation from first principles: the cap already bounds
    // per-key list length at 1000 ids (8 KB), so there is no hot-key
    // state to split — total aggregate state is the exploded frame's
    // partition share EITHER WAY, and level 2 re-shuffles the same
    // bytes a second time. The probe checks whether the measured
    // spill agrees.
    val salted = exploded
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(16)))
      .repartition(col("s"), col("salt"))
      .groupBy("s", "salt")
      .agg(count(lit(1)).as("pdf"),
        collect_list(col("doc_id")).as("pids"))
      .repartition(col("s"))
      .groupBy("s")
      .agg(sum("pdf").as("df"),
        flatten(collect_list(col("pids"))).as("ids"))
      .filter(col("df") >= 2 && col("df") <= cap)
    t("salted-2level-agg")(salted.count())
    val saltedPairs = salted
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
             transform(slice(ids, i + 2, size(ids)),
               y -> struct(least(x, y) AS a, greatest(x, y) AS b))))"""))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    t("salted-pair-explode+agg")(saltedPairs.count())
    t("full d2PairsOf")(
      graft.dedup.Dedup.d2PairsOf(docs, cap).count())
    spark.stop()
  }
}

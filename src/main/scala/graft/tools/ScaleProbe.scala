package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool for the round-14 core-scaling diagnosis (VERDICT r13
  * task 1): the driver's 8-vs-32-core block showed d8/d9 ~4× SLOWER
  * at 32 cores than at 8 in matched windows, while the builder's own
  * 32-core full run had them at the 8-core numbers — so the
  * inflation is conditional, not a deterministic core-count effect.
  * Wall time alone cannot distinguish the suspects (GC pressure from
  * 32-way allocation concurrency vs shuffle fan-out vs scheduler
  * overhead on iterative jobs); this probe runs named queries N
  * times at `$SPARK_GRAFT_CPUS` and prints, per iteration, the wall
  * seconds plus the task-metric decomposition that names the payer:
  * summed executor run/CPU time (run−cpu ≈ blocked time), summed GC
  * time, task count, and shuffle bytes. Scrubs like the bench. Not
  * part of the driver contract.
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir> <n> <name...>
  */
object ScaleProbe {
  private final class L extends SparkListener {
    val runMs = new AtomicLong
    val cpuNs = new AtomicLong
    val gcMs = new AtomicLong
    val deserMs = new AtomicLong
    val tasks = new AtomicLong
    val shufRead = new AtomicLong
    val jobs = new AtomicLong
    // per-stage: (tasks, sumRunMs, maxRunMs) — names the straggler
    val stages =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    override def onJobStart(
        js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        cpuNs.addAndGet(m.executorCpuTime)
        gcMs.addAndGet(m.jvmGCTime)
        deserMs.addAndGet(m.executorDeserializeTime)
        tasks.incrementAndGet()
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        stages.merge(te.stageId, (1L, m.executorRunTime, m.executorRunTime),
          (a, b) => (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3)))
      }
    }
    def drain(): (Long, Long, Long, Long, Long, Long, Long,
        Seq[(Int, (Long, Long, Long))]) = {
      import scala.jdk.CollectionConverters._
      val st = stages.asScala.toSeq.sortBy(-_._2._2)
      val t = (runMs.get, cpuNs.get / 1000000L, gcMs.get, deserMs.get,
        tasks.get, shufRead.get, jobs.get, st)
      runMs.set(0); cpuNs.set(0); gcMs.set(0); deserMs.set(0)
      tasks.set(0); shufRead.set(0); jobs.set(0); stages.clear()
      t
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new L
    spark.sparkContext.addSparkListener(l)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    names.foreach { name =>
      val times = (1 to n).map { i =>
        graft.SessionCaches.scrub(spark)
        l.drain()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the async listener bus drain
        val (run, cpu, gc, deser, tasks, sr, jobs, st) = l.drain()
        println(f"[scaleprobe] $name cpus=$cpus iter $i: wall $sec%.3f s " +
          f"| jobs $jobs tasks $tasks run ${run / 1e3}%.1f s " +
          f"cpu ${cpu / 1e3}%.1f s gc ${gc / 1e3}%.1f s " +
          f"deser ${deser / 1e3}%.1f s shuffle_read ${sr / 1048576.0}%.1f MB")
        st.filter(_._2._2 > 100).foreach { case (id, (n, sum, mx)) =>
          println(f"[scaleprobe]   stage $id: $n tasks " +
            f"sum ${sum / 1e3}%.2f s max ${mx / 1e3}%.2f s")
        }
        sec
      }
      println(f"[scaleprobe] $name cpus=$cpus min of $n: ${times.min}%.3f s")
    }
    spark.stop()
  }
}

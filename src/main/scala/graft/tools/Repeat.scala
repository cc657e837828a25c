package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: run one query N times in a warm JVM and print each
  * iteration's wall seconds plus the minimum — the robust instrument
  * for adjudicating sub-second deltas on a contended host (the
  * ambient noise inflates individual readings but almost never
  * DEFLATES one, so min-of-N isolates the compute floor). Scrubs the
  * session between iterations exactly like the bench so persists
  * from one iteration cannot feed the next. Not part of the driver
  * contract. Usage: runMain graft.tools.Repeat <sfDir> <n> <name...> */
object Repeat {
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
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    names.foreach { name =>
      val times = (1 to n).map { i =>
        graft.SessionCaches.scrub(spark)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[repeat] $name iter $i: $sec%.3f s")
        sec
      }
      println(f"[repeat] $name min of $n: ${times.min}%.3f s")
    }
    spark.stop()
  }
}

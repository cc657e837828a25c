package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Session-scoped scratch directories for the store-backed demo
  * queries (s12–s24, d11b, n8, …). Each query's scratch root carries
  * the applicationId so concurrent sessions on one host never race on
  * delete/overwrite — which means a session can only wipe its OWN
  * dirs at entry, and sibling sessions' trees would otherwise pile up
  * in java.io.tmpdir forever. [[fresh]] closes that leak: wipe at
  * entry (same-app re-runs start clean) AND register the dir for
  * JVM-exit deletion, so every normally-terminating session reaps its
  * scratch; only hard-killed JVMs leave dirs for the OS tmp reaper. */
object Scratch {

  /** Recursively delete `dir` now and schedule it for deletion at JVM
    * exit. Returns `dir` as a string for inline use. */
  def fresh(s: SparkSession, dir: Path): String = {
    val f = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(dir, true)
    f.deleteOnExit(dir)
    dir.toString
  }
}

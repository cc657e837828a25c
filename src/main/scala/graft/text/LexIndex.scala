package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** THE persisted inverted index of the corpus — one artifact set,
  * three consumers: x20 (the index-build view: df + posting heads),
  * x21 (point retrieval: BM25 over a fixed query), and x47's lexical
  * arm (per-document queries). The n8 build-once/serve-many split
  * applied to text: whichever consumer runs FIRST in a session pays
  * the one corpus-scale tokenize → (doc_id, token, tf) aggregate and
  * commits it (plus its two rollups — doc lengths, term document
  * frequencies) as snapshot-store tables; every other consumer, and
  * every repeat run, reads parquet and NEVER re-tokenizes the corpus
  * (VERDICT r8 task 7). Values are exact across the round-trip —
  * tf/df are integer counts, dl an exact-integer double — so every
  * consumer's output hash is unchanged vs its former inline build.
  *
  * Scale: the build is ONE corpus shuffle; the committed postings
  * are token-keyed parquet, so a serve-side `token IN (…)` filter
  * reaches the scan (predicate pushdown over the index — the
  * x21-at-100TB access path: three posting lists, not a corpus).
  * Keyed by applicationId like the BPE/IVF fit memos: a new session
  * over regenerated parquet rebuilds rather than trusting another
  * JVM's files. */
object LexIndex {

  private val tokens = split(col("text"), " ")

  private val roots = new java.util.concurrent.ConcurrentHashMap[
    (String, String), String]()

  /** Build-once root; computeIfAbsent so a concurrent first consumer
    * blocks until the commit lands. */
  private def root(s: SparkSession, dir: String): String =
    roots.computeIfAbsent((s.sparkContext.applicationId, dir), _ => {
      import graft.sources.SnapshotStore
      val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
      val r = new org.apache.hadoop.fs.Path(
        sys.props("java.io.tmpdir"),
        s"graft_lexidx$tag/${s.sparkContext.applicationId}").toString
      graft.sources.Scratch.fresh(s, new org.apache.hadoop.fs.Path(r))
      val tfBuild = Tables.documents(s, dir).select("doc_id", "text")
        .select(col("doc_id"), explode(tokens).as("token"))
        .groupBy("token", "doc_id")
        .agg(count(lit(1)).as("tf"))
      SnapshotStore.commit(tfBuild, s"$r/tf")
      // rollups derive from the COMMITTED postings: one tokenize
      // pass total, and the artifacts can never drift apart
      val back = SnapshotStore.read(s, s"$r/tf")
      SnapshotStore.commit(back.groupBy("doc_id")
        .agg(sum("tf").cast("double").as("dl")), s"$r/dl")
      SnapshotStore.commit(back.groupBy("token")
        .agg(count(lit(1)).as("df")), s"$r/df")
      r
    })

  /** (doc_id, token, tf bigint) — the postings. */
  def tf(s: SparkSession, dir: String): DataFrame =
    graft.sources.SnapshotStore.read(s, s"${root(s, dir)}/tf")
      .select("doc_id", "token", "tf")

  /** (doc_id, dl double) — the forward index (exact-integer doubles). */
  def dl(s: SparkSession, dir: String): DataFrame =
    graft.sources.SnapshotStore.read(s, s"${root(s, dir)}/dl")
      .select("doc_id", "dl")

  /** (token, df bigint) — term document frequencies, ALL tokens. */
  def df(s: SparkSession, dir: String): DataFrame =
    graft.sources.SnapshotStore.read(s, s"${root(s, dir)}/df")
      .select("token", "df")
}

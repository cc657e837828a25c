package graft

import org.apache.spark.sql.functions._
import graft.streaming.{IdempotentSink, NearDupStream}

class NearDupStreamSpec extends SparkTestBase {
  import spark.implicits._

  /** Corpus = the sfSmoke documents; new docs = exact copies,
    * near-dups (one appended token), and novel texts. */
  private def plantedNewDocs() = {
    val corpusTexts = Tables.documents(spark, sfSmoke)
      .select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).take(10)
    val exactCopies = corpusTexts.take(5).zipWithIndex.map {
      case ((_, t), i) => (100000L + i, t)
    }
    val nearDups = corpusTexts.drop(5).zipWithIndex.map {
      case ((_, t), i) => (200000L + i, t + " zz" + i)
    }
    val novel = (0 until 5).map { i =>
      (300000L + i, (0 until 20).map(j => s"qq${i}t$j").mkString(" "))
    }
    (exactCopies ++ nearDups ++ novel).toSeq.toDF("doc_id", "text")
  }

  test("batch gate drops exact and near dups, keeps novel docs") {
    val corpus = Tables.documents(spark, sfSmoke).select("doc_id", "text")
    val kept = NearDupStream.nearDupGate(plantedNewDocs(), corpus)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    assert((100000L until 100005L).forall(!keptIds.contains(_)),
      "exact copies must be gated")
    assert((200000L until 200005L).forall(!keptIds.contains(_)),
      "near-dups (one appended token) must be gated")
    assert((300000L until 300005L).forall(keptIds.contains),
      "novel docs must pass")
  }

  test("semantic gate: planted embedding leaks drop, organic rows " +
    "pass; streaming == batch") {
    val emb = Tables.embeddings(spark, sfSmoke)
      .select("vec_id", "embedding")
    val bench = emb.filter(col("vec_id") % 50 === 0)
    val organic = emb.filter(col("vec_id") % 50 =!= 0)
    val leaked = bench.select((col("vec_id") + 500000L).as("vec_id"),
      col("embedding"))
    val incoming = organic.union(leaked)
    val kept = NearDupStream.semanticGate(incoming, bench)
    // organic corpus–benchmark cosine tops out at ~0.49 here (the
    // x49 measurement): every organic row passes, every leak drops
    assert(kept.count() == organic.count())
    assert(kept.filter(col("vec_id") >= 500000L).isEmpty)
    // streaming parity in one batch
    val base = java.nio.file.Files
      .createTempDirectory("graft_semgate").toString
    incoming.coalesce(1).write.parquet(s"$base/incoming")
    bench.coalesce(1).write.parquet(s"$base/bench")
    val q = NearDupStream.startSemantic(spark, s"$base/bench",
      s"$base/incoming", s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val streamed = IdempotentSink.readOutput(spark, s"$base/out")
      .drop("batch_id")
    assert(streamed.count() == kept.count())
    assert(streamed.select("vec_id")
      .exceptAll(kept.select("vec_id")).count() == 0)
  }

  test("streaming gate == batch gate when the stream arrives in one batch") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_neardup").toString
    val newDocs = plantedNewDocs()
    newDocs.coalesce(1).write.parquet(s"$base/incoming")
    val corpusPath = s"$sfSmoke/documents.parquet"
    val q = NearDupStream.start(spark, corpusPath,
      s"$base/incoming", s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val streamed = IdempotentSink.readOutput(spark, s"$base/out")
      .drop("batch_id")
    val batch = NearDupStream.nearDupGate(newDocs,
      spark.read.parquet(corpusPath).select("doc_id", "text"))
    assert(batch.count() == 5)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }
}

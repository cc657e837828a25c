package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CurationPipeline

/** The e2e curation pipeline (x25/x26): stage-survival sanity, shard
  * manifest invariants, and x25/x26 consistency. The value-level gate
  * is the DuckDB oracle replay of every stage (Verify); here we pin
  * the structural contracts that SQL can't express. */
class PipelineSpec extends SparkTestBase {

  test("x25 manifest: shards partition the kept docs, budget holds") {
    val manifest = CurationPipeline.x25PipelineE2e(spark, sfSmoke)
      .collect()
    assert(manifest.nonEmpty)
    val totalDocs = manifest.map(_.getLong(1)).sum
    assert(totalDocs > 0, "pipeline must keep a non-empty corpus")
    // the pipeline PRUNES: every stage's gate is live on this corpus
    val raw = Tables.documents(spark, sfSmoke).count()
    assert(totalDocs < raw,
      s"pipeline kept $totalDocs of $raw — nothing was pruned")
    manifest.foreach { r =>
      val (shard, nDocs, nSeqs, sumTok) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(shard >= 0 && shard < 8)
      assert(nSeqs >= 1 && nSeqs <= nDocs)
      assert(sumTok >= nDocs * 10, "gate guarantees >= 10 tokens/doc")
      assert(r.getString(4).length == 32, "md5 hex digest")
    }
  }

  test("kept docs are unique, gated, and near-dup-free at the pair level") {
    val kept = CurationPipeline.keptDocs(spark, sfSmoke)
      .select("doc_id", "text", "n_tokens").cache()
    try {
      val n = kept.count()
      assert(kept.select("doc_id").distinct().count() == n)
      // no surviving near-dup pair among kept docs: rerunning the
      // capped pair kernel on the KEPT corpus must find nothing
      val residual = graft.dedup.Dedup.d2PairsOf(
        kept.select("doc_id", "text"), graft.dedup.Dedup.StopShingleCap)
      assert(residual.isEmpty,
        "keep-list left a near-dup pair in the corpus")
      // benchmark slice is gone
      assert(kept.filter(col("doc_id") % 50 === 0).isEmpty)
    } finally kept.unpersist()
  }

  test("pipeline plan shape: decontamination sides broadcast, no cartesian") {
    // inspect the UN-cached stage-1..5 plan (survivedDocs checkpoints
    // it away): both small sides of decontamination — the benchmark
    // gram set and the contaminated-id hit list — must broadcast so
    // the corpus side pays no exchange for stage 3
    val plan = graft.pipeline.CurationPipeline
      .survivedPlan(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    val nBroadcast =
      "BroadcastExchange".r.findAllIn(plan).length
    assert(nBroadcast >= 2,
      s"expected both decontamination sides broadcast, saw $nBroadcast")
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"),
      "contaminated-id anti-join must be a broadcast hash join")
    assert(!plan.contains("CartesianProduct"),
      "pipeline plan must not contain a cartesian product")
  }

  test("x26b pinned-merge kernel: closed form len − occ(th) − occ(the) " +
    "holds; gate totals match the x25 manifest") {
    // the merge-replay kernel on hand-computed fixtures of the
    // pinned (t,h),(th,e) table
    val bpe = text.BpeMerges.tokenCounter(Seq(("t", "h"), ("th", "e")))
    assert(bpe("the") == 1)    // t,h,e → th,e → the
    assert(bpe("thethe") == 2)
    assert(bpe("tth") == 2)    // t + th
    assert(bpe("thth") == 2)
    assert(bpe("hat") == 3)    // neither merge fires
    assert(bpe("t") == 1 && bpe("") == 0)
    // per-shard doc counts and whitespace mass must equal the x25
    // manifest's (same keptDocs DAG underneath)
    val m25 = CurationPipeline.x25PipelineE2e(spark, sfSmoke)
      .select("shard", "n_docs", "sum_tokens").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val gate = CurationPipeline.x26bTokenGate(spark, sfSmoke).collect()
    assert(gate.map(_.getLong(0)).toSet == m25.keySet)
    gate.foreach { r =>
      val (nDocs, wsTok) = m25(r.getLong(0))
      assert(r.getLong(1) == nDocs && r.getLong(2) == wsTok)
      assert(r.getLong(3) > 0, "pinned-merge token mass must be positive")
    }
  }

  test("x26 tokenization agrees with the x25 manifest per shard") {
    val m25 = CurationPipeline.x25PipelineE2e(spark, sfSmoke)
      .select("shard", "n_docs", "sum_tokens").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m26 = CurationPipeline.x26PipelineTokens(spark, sfSmoke)
      .collect()
    assert(m26.map(_.getLong(0)).toSet == m25.keySet)
    m26.foreach { r =>
      val (shard, nDocs, ws, bpe) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDocs == m25(shard)._1, s"shard $shard doc count drift")
      assert(ws == m25(shard)._2, s"shard $shard ws-token drift")
      // BPE merges only ever shrink the [a-z]+ token stream relative
      // to characters, and can't exceed the whitespace-token count
      // times max word length; the useful bound: bpe > 0
      assert(bpe > 0)
    }
  }
}

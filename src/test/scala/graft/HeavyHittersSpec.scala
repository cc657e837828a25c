package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters
import graft.sources.SnapshotStore
import graft.streaming.HeavyHitterStream

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int)
      : Map[String, Long] =
    df.agg(HeavyHitters.heavyHitters(k)(col("token")).as("hh"))
      .head().getMap[String, Long](0).toMap

  test("MG bound: lower-bound counts, additive error, frequent keys survive") {
    val toks = Tables.documents(spark, sfSmoke)
      .select(explode(split(col("text"), " ")).as("token"))
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 64
    val err = n / (k + 1)
    val mg = sketch(toks, k)
    assert(mg.nonEmpty && mg.size <= k)
    mg.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
      assert(c >= exact(t) - err,
        s"$t undercounted past the bound: $c < ${exact(t)} - $err")
    }
    val mustSurvive = exact.filter(_._2 > err).keySet
    assert(mustSurvive.subsetOf(mg.keySet),
      s"guaranteed keys missing: ${mustSurvive -- mg.keySet}")
  }

  test("planted hot key survives a wide-partition merge with a tight count") {
    val hot = Seq.fill(10000)("hot")
    val noise = (0 until 5000).map(i => s"t$i")
    val toks = (hot ++ noise).toDF("token").repartition(32)
    val n = hot.length + noise.length
    val k = 64
    val mg = sketch(toks, k)
    assert(mg.contains("hot"))
    assert(mg("hot") >= hot.length - n / (k + 1))
    assert(mg("hot") <= hot.length)
  }
  test("streaming MG state: bounded at k, envelope holds across " +
      "batch merges, replay is a no-op") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_hhs").toString + "/t"
    val docs = Tables.documents(spark, sfSmoke)
    val k = 8
    // two crawl batches fold sequentially through the state table
    HeavyHitterStream.applyBatch(spark,
      docs.filter(col("doc_id") % 2 === 0), 0L, root, k)
    HeavyHitterStream.applyBatch(spark,
      docs.filter(col("doc_id") % 2 === 1), 1L, root, k)
    val state = SnapshotStore.read(spark, root)
      .select("token", "count_lb").as[(String, Long)].collect().toMap
    assert(state.size <= k)
    val truth = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    val n = truth.values.sum
    val slack = n / (k + 1)
    truth.foreach { case (t, c) =>
      if (c > slack) assert(state.contains(t),
        s"frequent token $t (true $c > n/(k+1) = $slack) missing")
    }
    state.foreach { case (t, lb) =>
      assert(lb <= truth(t), s"$t: lb $lb above true ${truth(t)}")
      assert(lb >= truth(t) - slack,
        s"$t: lb $lb below envelope ${truth(t) - slack}")
    }
    // a redelivered batch id must not move the state
    val snaps = SnapshotStore.snapshots(spark, root)
    HeavyHitterStream.applyBatch(spark, docs, 1L, root, k)
    assert(SnapshotStore.snapshots(spark, root) == snaps)
    // end-to-end streaming plumbing over the same corpus
    val base = java.nio.file.Files
      .createTempDirectory("graft_hhq").toString
    val q = HeavyHitterStream.start(spark, sfSmoke,
      s"$base/state", s"$base/ckpt", k)
    try q.processAllAvailable() finally q.stop()
    assert(SnapshotStore.read(spark, s"$base/state").count() <= k)
  }

  test("x9b gate: bounded domain under k ⇒ the sketch IS the exact " +
      "group-by (the oracle's closed form)") {
    import org.apache.spark.sql.functions._
    val got = graft.text.TextAnalysis
      .x9bHeavyHittersGate(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = graft.Tables.documents(spark, sfSmoke)
      .select(explode(split(col("text"), " ")).as("t"))
      .select(least(length(col("t")), lit(30)).cast("string").as("k"))
      .groupBy("k").count()
      .orderBy(col("count").desc, col("k"))
      .limit(20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.Chunking

/** x35 line gates / x36 chunk windows / x39 leakage-safe split. */
class ChunkingSpec extends SparkTestBase {

  private def physicalString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("x35: per-doc line accounting is internally consistent") {
    val r = Chunking.x35LineGates(spark, sfSmoke).cache()
    val docs = Tables.documents(spark, sfSmoke).count()
    assert(r.count() == docs, "one row per document")
    // kept is a subset of lines; token mass bounded by 15/kept line
    assert(r.filter(col("n_kept") > col("n_lines")).isEmpty)
    assert(r.filter(col("n_kept_tokens") > col("n_kept") * 15).isEmpty)
    assert(r.filter(col("n_kept_tokens") < col("n_kept") * 5).isEmpty,
      "every kept line passed the >=5 token gate")
    // the gates BIND on this corpus (drop something, keep something)
    val agg = r.agg(sum("n_lines"), sum("n_kept")).head()
    assert(agg.getLong(1) > 0 && agg.getLong(1) < agg.getLong(0))
    r.unpersist()
  }

  test("x35: planted lines hit each gate; clean text round-trips") {
    import spark.implicits._
    // line 1: 15 distinct tokens incl. a stopword  -> kept
    val good = (1 to 14).map(i => s"tok$i").mkString("the ", " ", "")
    // line 2: repeats one token 15x                -> distinct gate
    val boiler = Seq.fill(15)("menu").mkString(" ")
    // line 3: 15 distinct tokens, NO stopword      -> prose gate
    val noStop = (21 to 35).map(i => s"tok$i").mkString(" ")
    // line 4: 3 tokens                             -> length gate
    val short = "the tail x"
    val docs = Seq(
      (1L, s"$good $boiler $noStop $short"),
      (2L, s"$good $good")).toDF("doc_id", "text")
    val r = Chunking.lineGatesOf(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 4 && r(1L).getLong(2) == 1 &&
      r(1L).getLong(3) == 15)
    // doc 2 is fully kept: cleaned text == original text
    assert(r(2L).getLong(1) == 2 && r(2L).getLong(2) == 2)
    val wantMd5 = docs.filter(col("doc_id") === 2)
      .select(md5(col("text"))).head().getString(0)
    assert(r(2L).getString(4) == wantMd5)
  }

  test("x36: windows tile every token with stride overlap") {
    val r = Chunking.x36ChunkWindows(spark, sfSmoke).cache()
    val docs = Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    // chunk_idx 0..nWin-1 dense per doc, nWin = 1+ceil(max(n-64,0)/48)
    val per = r.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("chunk_idx").as("max_idx"),
        sum("n_tok").as("tok_sum"), min("n_tok").as("min_tok"))
      .join(docs, "doc_id")
    assert(per.filter(col("n_chunks") =!= col("max_idx") + 1).isEmpty)
    assert(per.filter(col("n_chunks") =!=
      ceil(greatest(col("n") - 64, lit(0)) / 48.0) + 1).isEmpty)
    // coverage: total chunk tokens = n + 16-token overlap per interior
    // boundary (each of the nWin-1 overlaps re-emits 64-48 tokens)
    assert(per.filter(col("tok_sum") =!=
      col("n") + (col("n_chunks") - 1) * (64 - 48)).isEmpty)
    assert(per.filter(col("min_tok") <= 0).isEmpty, "no empty chunk")
    r.unpersist()
  }

  test("x36: chunk 0 is the document prefix, verbatim") {
    val prefix = Tables.documents(spark, sfSmoke)
      .select(col("doc_id"),
        md5(array_join(slice(split(col("text"), " "), 1, 64), " "))
          .as("prefix_md5"))
    val c0 = Chunking.x36ChunkWindows(spark, sfSmoke)
      .filter(col("chunk_idx") === 0)
    assert(c0.join(prefix, "doc_id")
      .filter(col("chunk_md5") =!= col("prefix_md5")).isEmpty)
  }

  test("x35/x36 plan: zero exchanges — pure scan-level generators") {
    for (df <- Seq(Chunking.x35LineGates(spark, sfSmoke),
        Chunking.x36ChunkWindows(spark, sfSmoke))) {
      val s = physicalString(df)
      assert(!s.contains("Exchange"), s"expected shuffle-free plan:\n$s")
    }
  }

  test("x39: no near-dup pair crosses splits (the leakage property)") {
    val labels = Dedup.d6DedupClusters(spark, sfSmoke).cache()
    val split = labels.withColumn("m",
        shiftright(col("rep") * 2654435761L, 16) % 10)
      .select(col("doc_id"),
        when(col("m") < 8, "train").when(col("m") === 8, "val")
          .otherwise("test").as("split"))
    val pairs = Dedup.d2bDedupNgramCapped(spark, sfSmoke)
    val crossing = pairs
      .join(split.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), "doc_a")
      .join(split.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(crossing.isEmpty,
      "cluster-keyed assignment must keep near-dup pairs split-local")
    labels.unpersist()
  }

  test("e5 funnel: stage chain is strictly ordered per user") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_e5").toString
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // A: view<click<purchase (full chain); B: click BEFORE its view
    // (click must not count, so neither can the purchase); C: no click
    Seq(
      (1L, ts(1), 100L, "view", 1.0, ""),
      (2L, ts(2), 100L, "click", 1.0, ""),
      (3L, ts(3), 100L, "purchase", 1.0, ""),
      (4L, ts(1), 200L, "click", 1.0, ""),
      (5L, ts(2), 200L, "view", 1.0, ""),
      (6L, ts(3), 200L, "purchase", 1.0, ""),
      (7L, ts(1), 300L, "view", 1.0, ""),
      (8L, ts(2), 300L, "purchase", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.streaming.EventStreams.e5Funnel(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L),
      s"got $got")
  }

  test("g19 winsorize: caps bind, mass shrinks, thresholds are " +
      "in-group order statistics") {
    val r = ops.Aggregates.g19Winsorize(spark, sfSmoke).cache()
    assert(r.count() == 5)
    // lo <= hi; capped mass bounded by the caps; caps actually bind
    // (two-sided winsorize RAISES the low tail too, so capped vs raw
    // ordering is data-dependent — only the bound is an invariant)
    assert(r.filter(col("lo") > col("hi")).isEmpty)
    assert(r.filter(col("sum_capped") < col("n_orders") * col("lo") ||
      col("sum_capped") > col("n_orders") * col("hi")).isEmpty)
    assert(r.filter(col("sum_capped") =!= col("sum_raw")).count() > 0)
    // thresholds are real in-group values
    val th = r.select("o_orderpriority", "lo", "hi").collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2)))
    val byG = Tables.orders(spark, sfSmoke)
      .select("o_orderpriority", "o_totalprice").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).toSet).toMap
    for ((g, lo, hi) <- th)
      assert(byG(g).contains(lo) && byG(g).contains(hi))
    r.unpersist()
  }

  test("o5 weighted sample: k rows, weight-biased, bounded-heap plan") {
    val df = ops.Ordering.o5WeightedSample(spark, sfSmoke)
    val rows = df.collect()
    assert(rows.length == 100)
    // ES sampling ∝ w: the sample's mean weight must exceed the
    // corpus mean (longer docs overrepresented)
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    val corpusMean = Tables.documents(spark, sfSmoke)
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
    // global top-k plans as bounded per-partition heaps, not a sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("w5 ewma: golden fold on a planted sequence, order pinned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_w5").toString
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // values arrive OUT of event-time order in the file; the fold
    // must still run in (ts, event_id) order: ((8+4)/2+2)/2 = 4.0
    Seq(
      (3L, ts(3), 1L, "view", 2.0, ""),
      (1L, ts(1), 1L, "view", 8.0, ""),
      (2L, ts(2), 1L, "view", 4.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ops.Aggregates.w5Ewma(spark, dir).collect()
    assert(r.length == 1 && r(0).getLong(1) == 3 &&
      r(0).getDouble(2) == 4.0, s"got ${r.toSeq}")
  }

  test("x39: split summary accounts for every doc and cluster once") {
    val r = Chunking.x39LeakageSafeSplit(spark, sfSmoke).cache()
    val docs = Tables.documents(spark, sfSmoke).count()
    assert(r.agg(sum("n_docs")).head().getLong(0) == docs)
    // every cluster in exactly one split => per-split cluster counts
    // sum to the global cluster count
    val clusters = Dedup.d6DedupClusters(spark, sfSmoke)
      .select("rep").distinct().count()
    assert(r.agg(sum("n_clusters")).head().getLong(0) == clusters)
    assert(r.count() == 3)
    r.unpersist()
  }

  test("x45: one worst match per touched doc, flag honors the threshold") {
    import graft.text.TextAnalysis
    val r = TextAnalysis
      .x45FuzzyDecontamination(spark, sfSmoke).cache()
    // exactly the x13-touched docs appear (both = docs sharing >= 1
    // benchmark 4-gram), one row each
    val touched = TextAnalysis.x13Contamination(spark, sfSmoke)
      .select("doc_id")
    assert(r.select("doc_id").except(touched).isEmpty &&
      touched.except(r.select("doc_id")).isEmpty,
      "x45 and x13 must flag the same doc set")
    assert(r.groupBy("doc_id").count().filter(col("count") > 1)
      .isEmpty, "one worst match per doc")
    // containment is a fraction; the flag is exactly the threshold
    assert(r.filter(col("containment") <= 0 || col("containment") > 1)
      .count() == 0)
    // flag computed on the RAW ratio; emitted value is r4-rounded, so
    // compare with half-ulp-of-r4 slack around the threshold
    assert(r.filter(col("contaminated") &&
      col("containment") < 0.4999).count() == 0)
    assert(r.filter(!col("contaminated") &&
      col("containment") > 0.5001).count() == 0)
    r.unpersist()
  }

  test("x43: kept set is budget-maximal in quality order") {
    import graft.text.TextAnalysis
    val kept = TextAnalysis.x43BudgetCuration(spark, sfSmoke).cache()
    val scored = TextAnalysis.x2TextQuality(spark, sfSmoke)
      .select("doc_id", "n_tokens", "quality_score")
    val budget = scored.agg(sum("n_tokens")).head().getLong(0) / 2
    val keptMass = kept.agg(sum("n_tokens")).head().getLong(0)
    assert(keptMass <= budget, "kept token mass fits the budget")
    // greedy-maximality: the next doc in (quality desc, doc_id) order
    // among the dropped would overflow — the selection stopped exactly
    // where the budget ran out, not earlier
    val next = scored
      .join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
      .orderBy(col("quality_score").desc, col("doc_id"))
      .select("n_tokens").head().getLong(0)
    assert(keptMass + next > budget, "no further doc fits the budget")
    kept.unpersist()
  }

  test("x43 plan: at most the boundary-sliver exchange — no corpus sort") {
    import graft.text.TextAnalysis
    val s = physicalString(TextAnalysis.x43BudgetCuration(spark, sfSmoke))
    // the keep branch is a pure scan-level filter; only the boundary
    // bucket (~1/10k of the corpus) may cross a SinglePartition
    // exchange for its running-sum window
    assert("Exchange".r.findAllIn(s).size <= 1,
      s"expected at most the boundary-bucket exchange:\n$s")
    assert(!s.contains("rangepartitioning"),
      s"expected no global sort of the corpus:\n$s")
  }
}

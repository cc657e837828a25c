package graft

import org.apache.spark.sql.functions._

/** Smoke + semantics for the SparkEntry operator inventory. The deep
  * correctness gate is the DuckDB oracle (Verify + driver compare);
  * these tests pin the semantics that the oracle can't see: schema
  * shapes, known golden values, and edge-case behavior. */
class OperatorSpec extends SparkTestBase {

  test("every query runs and yields rows at sf0.001 (documents ops at sf0.01)") {
    // documents/embeddings are tiny at sf0.001 — near-dup pair queries
    // legitimately return few/zero rows there; run those at sf0.01.
    val needsDocs = Set("d2_dedup_ngram_jaccard", "d3_dedup_minhash_lsh",
      "d4_dedup_simhash", "d5_dedup_embedding", "x13_contamination")
    SparkEntry.queries.foreach { case (name, fn) =>
      val dir = if (needsDocs(name)) sfTest else sfSmoke
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows on $dir")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("rollup/cube plans: one Expand + one exchange, never a union") {
    for (q <- Seq("g14_rollup", "g15_cube")) {
      val plan = SparkEntry.queries(q)(spark, sfSmoke)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Expand"), s"$q missing Expand:\n$plan")
      assert("Exchange".r.findAllIn(plan).size == 1,
        s"$q should shuffle exactly once:\n$plan")
      assert(!plan.contains("Union"),
        s"$q grouping sets must not plan as a union:\n$plan")
    }
  }

  test("entry (flagship) returns the 6 returnflag×linestatus groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0 && rows.length <= 6)
    val schema = SparkEntry.entry(spark).schema.fieldNames.toSet
    assert(schema == Set("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "avg_qty", "count_order"))
  }

  test("c1 dirty cast: sentinels to NULL, clean strings parse") {
    import spark.implicits._
    val df = Seq("", "-", "15667000").toDF("dirty")
      .withColumn("parsed",
        when(col("dirty").isin("", "-"), lit(null))
          .otherwise(col("dirty")).cast("double"))
    val got = df.select("parsed").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(None, None, Some(1.5667e7)))
  }

  test("c4 rounding parity: R half-even = bround, oracle half-up = round") {
    import spark.implicits._
    val df = Seq(45.0, 35.0, 44.9).toDF("x")
      .select(round(col("x"), -1).as("half_up"),
        bround(col("x"), -1).as("half_even"))
    val rows = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows(0) == ((50.0, 40.0))) // R round(45,-1)=40 (half-even)
    assert(rows(1) == ((40.0, 40.0)))
    assert(rows(2) == ((40.0, 40.0)))
  }

  test("g9 weighted mean: all-NULL group yields NULL (reference fallback)") {
    import spark.implicits._
    val df = Seq(("g1", Some(10.0), 2.0), ("g1", Some(20.0), 2.0),
      ("g2", None, 3.0)).toDF("k", "price", "qty")
    val out = df.groupBy("k").agg(
      (sum(when(col("price").isNotNull, col("price") * col("qty")))
        / sum(when(col("price").isNotNull, col("qty")))).as("wm"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("g1").contains(15.0))
    assert(out("g2").isEmpty) // NULL, not NaN or 0
  }

  test("v1 pivot has fixed band schema independent of data") {
    val df = ops.Reshape.v1Pivot(spark, sfSmoke)
    assert(df.schema.fieldNames.toSeq ==
      Seq("l_suppkey", "qty_010", "qty_020", "qty_030", "qty_040", "qty_050"))
  }

  test("o3 stratified sample: ~80% per stratum, key-derived, no sort") {
    val df = ops.Ordering.o3StratifiedSample(spark, sfTest)
    val sampled = df.groupBy("c_mktsegment").count()
    val full = Tables.customer(spark, sfTest)
      .groupBy("c_mktsegment").count().withColumnRenamed("count", "total")
    val joined = sampled.join(full, "c_mktsegment").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val frac = r.getLong(1).toDouble / r.getLong(2)
      assert(frac > 0.7 && frac < 0.9,
        s"${r.getString(0)}: train fraction $frac outside [0.7, 0.9]")
    }
    // the scale contract: a pure filter — no Window, no Sort anywhere
    // in the optimized plan (the old rank-within-stratum form globally
    // sorted each stratum in one task)
    import org.apache.spark.sql.catalyst.plans.logical.{Sort, Window => LWindow}
    val plan = df.queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow => w }.isEmpty, "Window in plan")
    assert(plan.collect { case s: Sort => s }.isEmpty, "Sort in plan")
    // the mix must be REAL: membership not periodic over sequential
    // keys (the pre-fix (k*m) % 10 degenerated to k % 10 because
    // m ≡ 1 mod 10 — a fixed keep-pattern every 10 keys)
    def keep(k: Long) = ((k * 2654435761L) >> 16) % 10 < 8
    val flips = (1L to 990L).count(k => keep(k) != keep(k + 10))
    assert(flips > 100, s"keep-decision looks periodic mod 10 ($flips flips)")
  }

  test("observe counters ride an existing action: rows, nulls, domain") {
    import spark.implicits._
    val df = Seq((1, Some(5.0)), (2, None), (3, Some(-1.0)),
      (4, Some(2.0))).toDF("id", "v")
    val observed = ops.Observe.withQualityCounters(df, "v",
      Some(col("v") >= 0.0))
    // metrics do not perturb the data... (collect() drives THIS
    // frame's QueryExecution — which is what populates the metrics)
    assert(observed.collect().length == 4)
    // ...and the counters merged during that same action
    val m = ops.Observe.lastObserved(observed).get
    assert(m.getAs[Long]("n_rows") == 4)
    assert(m.getAs[Long]("n_nulls") == 1)
    // NULL fails the domain predicate too (coalesce(ok, false))
    assert(m.getAs[Long]("n_domain_violations") == 2)
  }

  test("observe counters on an EMPTY frame read 0, never NULL") {
    import spark.implicits._
    val df = Seq((1, Some(5.0))).toDF("id", "v").filter(lit(false))
    val observed = ops.Observe.withQualityCounters(df, "v",
      Some(col("v") >= 0.0))
    assert(observed.collect().isEmpty)
    val m = ops.Observe.lastObserved(observed).get
    // sum() over zero rows is NULL unless coalesced — the streaming
    // empty-micro-batch case a monitoring consumer must survive
    assert(!m.isNullAt(m.fieldIndex("n_nulls")) &&
      m.getAs[Long]("n_nulls") == 0L)
    assert(!m.isNullAt(m.fieldIndex("n_domain_violations")) &&
      m.getAs[Long]("n_domain_violations") == 0L)
    assert(m.getAs[Long]("n_rows") == 0L)
  }

  test("x12 unigram NLL: golden values on a planted two-doc corpus") {
    import spark.implicits._
    // corpus: "a a" + "a b" → counts a:3 b:1, total 4
    // nll(doc0) = ln(4/3); nll(doc1) = (ln(4/3) + ln(4)) / 2
    // (each -ln p quantized to 1e-4 before averaging, per the op)
    val dir = java.nio.file.Files.createTempDirectory("graft_x12").toString
    Seq((0L, "a a"), (1L, "a b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.TextAnalysis.x12UnigramNll(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    def q(x: Double) = math.floor(x * 10000.0 + 0.5)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ln43 = q(math.log(4.0 / 3.0))
    assert(out(0L) == ((r6(ln43 * 2 / (10000.0 * 2)), 2L)))
    assert(out(1L) == ((r6((ln43 + q(math.log(4.0))) / (10000.0 * 2)), 2L)))
  }

  test("x40 ppl buckets: terciles ordered, exhaustive, tie-stable") {
    val r = text.TextAnalysis.x40PplBuckets(spark, sfSmoke)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    val docs = Tables.documents(spark, sfSmoke).count()
    assert(r.values.map(_._1).sum == docs, "every doc lands in a bucket")
    // value ranges are disjoint and ordered head < middle < tail
    assert(r("head")._4 < r("middle")._3 && r("middle")._4 < r("tail")._3)
    // terciles within tie slack of n/3 (boundary ties go low)
    assert(r("head")._1 >= docs / 3 &&
      r("tail")._1 <= docs - 2 * (docs / 3),
      s"head takes its tercile plus ties: $r")
  }

  test("x41 novelty: df=1 fractions, per-doc-distinct repeat handling") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_x41").toString
    Seq(
      (0L, "p q r s"),      // "p q r" shared with doc 1, "q r s" unique
      (1L, "p q r t"),
      (2L, "u v w x y"),    // all three grams unique
      (3L, "m m m m"))      // repeated gram counts once (df=1 -> novel)
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.TextAnalysis.x41NoveltyScore(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      0L -> ((2L, 1L, 0.5)), 1L -> ((2L, 1L, 0.5)),
      2L -> ((3L, 3L, 1.0)), 3L -> ((1L, 1L, 1.0))), s"got $out")
  }

  test("x13 contamination flags only docs sharing a 4-gram with bench") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_x13").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon"), // benchmark (0 % 50 == 0)
      (1L, "x alpha beta gamma delta epsilon z"), // shares 2 distinct 4-grams
      (2L, "totally unrelated words only here"),
      (3L, "alpha beta gamma other tail"))    // 3-gram overlap only
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.TextAnalysis.x13Contamination(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L),
      s"expected only doc 1 with 2 shared 4-grams, got $out")
  }

  test("x14 mixture: en kept whole, others downsampled near target") {
    val docs = Tables.documents(spark, sfTest)
    val kept = text.TextAnalysis.x14MixtureSample(spark, sfTest)
    val full = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sub = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sub("en") == full("en"), "en must be kept at 100%")
    // de targets 50%: multiplicative-mix residues are uniform enough
    // that 70+ docs land within a wide band
    val deFrac = sub.getOrElse("de", 0L).toDouble / full("de")
    assert(deFrac > 0.3 && deFrac < 0.7, s"de fraction $deFrac")
    // fr at 10%, zh (unlisted) at 5% — strictly downsampled
    assert(sub.getOrElse("fr", 0L) < full("fr") / 2)
    assert(sub.getOrElse("zh", 0L) < full("zh") / 2)
    // pure filter, no shuffle
    import org.apache.spark.sql.catalyst.plans.logical.{Sort, Window => LW}
    val plan = kept.queryExecution.optimizedPlan
    assert(plan.collect { case w: LW => w }.isEmpty &&
      plan.collect { case s: Sort => s }.isEmpty)
  }

  test("x17 training shards: balanced, complete, deterministically " +
      "ordered shard files") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfTest)
    val total = docs.count()
    // manifest side: every doc in exactly one of 32 shards, balance
    // within a binomial-plausible band (5000 docs, mean ~156/shard)
    val manifest = text.TextAnalysis.x17TrainingShards(spark, sfTest)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manifest.keySet == (0L until 32L).toSet)
    assert(manifest.values.sum == total)
    val (mn, mx) = (manifest.values.min, manifest.values.max)
    assert(mx < 2 * mn, s"shard imbalance: min=$mn max=$mx")
    // write side: 32 hive partitions, same totals, and within a shard
    // rows surface in mix order (the deterministic global shuffle)
    val out = java.nio.file.Files
      .createTempDirectory("graft_shards").toString + "/corpus"
    text.TextAnalysis.writeShards(
      docs.select("doc_id", "text"), out)
    val back = spark.read.parquet(out)
    assert(back.count() == total)
    assert(back.select("shard").distinct().count() == 32)
    val shard0 = spark.read
      .parquet(s"$out/shard=7").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val mixOrder = shard0
      .sortBy(id => (id * 2654435761L) % 1000000007L)
    assert(shard0 == mixOrder,
      "rows within a shard file must be in mix (shuffled) order")
    assert(shard0 != shard0.sorted,
      "shard order must not degenerate to key order")
  }

  test("x15 repetition goldens on a planted repetitious doc") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_x15").toString
    Seq((0L, "a a a a a"), (1L, "v w x y z"), (2L, "a b"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.TextAnalysis.x15Repetition(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(0L) == ((5L, r6(1.0 / 5.0), r6(1.0 - 1.0 / 3.0))))
    assert(out(1L) == ((5L, 1.0, 0.0))) // all distinct
    assert(out(2L) == ((2L, 1.0, 0.0))) // too short for 3-grams
  }

  test("x20 inverted index: heap-capped postings, full df, plan has " +
      "TopKPerKey and no per-token Window sort") {
    val dir = sfTest
    val out = text.TextAnalysis.x20InvertedIndex(spark, dir)
    // the cap runs through the custom bounded-heap operator, not a
    // window rank — a per-token Window would sort every stop-word's
    // full posting list at scale
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"expected the bounded-heap operator:\n$plan")
    assert(!plan.contains("Window"), s"window rank in plan:\n$plan")
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byToken = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getString(2).split(" ").toSeq)).toMap
    byToken.foreach { case (tok, (df, postings)) =>
      assert(df >= 5, s"'$tok' df=$df below tail cutoff")
      assert(postings.length <= 100 && postings.length > 0)
      // head block is the FIRST postings by doc_id: if the list is
      // uncapped it must carry exactly df entries
      if (df <= 100) assert(postings.length == df,
        s"'$tok' df=$df but ${postings.length} postings")
      assert(postings == postings.sorted, s"'$tok' postings unsorted")
    }
    // retrieval check: AND-intersecting two uncapped posting lists
    // equals the direct corpus scan for docs containing both tokens
    val both = byToken.collect {
      case (tok, (df, ps)) if df <= 100 => tok -> ps.map(_.split(":")(0).toLong).toSet
    }
    if (both.size >= 2) {
      val Seq((t1, d1), (t2, d2)) = both.toSeq.sortBy(_._1).take(2)
      val expect = Tables.documents(spark, dir)
        .filter(array_contains(split(col("text"), " "), t1) &&
          array_contains(split(col("text"), " "), t2))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert((d1 intersect d2) == expect,
        s"index lookup for '$t1' AND '$t2' != scan")
    }
  }

  test("w4 gap-fill: dense per-user hourly grid, carry-forward only " +
      "after first observation") {
    val dir = sfSmoke
    val out = ops.Aggregates.w4GapFill(spark, dir).collect()
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
    val users = ev.select("user_id").distinct().count()
    val hours = ev.agg((((unix_micros(max(col("hr"))) -
      unix_micros(min(col("hr")))) / 3600000000L) + 1L).cast("long"))
      .head().getLong(0)
    assert(out.length == users * hours,
      s"${out.length} != $users users x $hours hours")
    // per user: null prefix (nothing to carry), then values persist
    // across gaps — once filled, never null again
    out.groupBy(_.getLong(0)).foreach { case (u, rows) =>
      val vals = rows.sortBy(_.getLong(1)).map(r =>
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      val firstObs = vals.indexWhere(_.isDefined)
      if (firstObs >= 0)
        assert(vals.drop(firstObs).forall(_.isDefined),
          s"user $u: null after first observation")
    }
  }

  test("s16 expectations: clean/quarantine partition the input; " +
      "failure labels and summary counts agree") {
    import ops.Expectations
    val dir = sfTest
    val df = Expectations.planted(spark, dir)
    val es = Expectations.lineitemExpectations
    val total = df.count()
    val clean = Expectations.clean(df, es)
    val quar = Expectations.quarantine(df, es).collect()
    // exact two-way partition — no row lost, none double-counted
    assert(clean.count() + quar.length == total)
    // every quarantined row names at least one failed expectation,
    // and the names re-verify against the row's own values
    assert(quar.nonEmpty)
    quar.foreach { r =>
      val failed = r.getAs[collection.Seq[String]]("failed_expectations")
      assert(failed.nonEmpty)
      if (failed.contains("quantity_range"))
        assert(r.getAs[Double]("l_quantity") <= 0 ||
          r.getAs[Double]("l_quantity") > 50)
      if (failed.contains("returnflag_present"))
        assert(r.isNullAt(r.fieldIndex("l_returnflag")))
    }
    // summary counts match the materialized split
    val sm = Expectations.s16Expectations(spark, dir).head()
    assert(sm.getAs[Long]("n_rows") == total)
    assert(sm.getAs[Long]("n_quarantined") == quar.length)
    val nNullFlag = quar.count(
      _.getAs[collection.Seq[String]]("failed_expectations")
        .contains("returnflag_present"))
    assert(sm.getAs[Long]("n_fail_returnflag_present") == nNullFlag)
  }

  test("x21 index-serve BM25 == x11 scan-time BM25, top-20 bit-equal") {
    val dir = sfTest
    val scan = text.TextAnalysis.x11Bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val serve = text.TextAnalysis.x21IndexRetrieval(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // same ranking, same rounded scores: skipping zero-score docs
    // and summing per-term rows instead of a per-doc column fold
    // must not change the result
    assert(serve.toSeq == scan.toSeq,
      s"serve=${serve.toSeq}\nscan=${scan.toSeq}")
  }

  test("j8 salted-join plan: small side replicated, join key salted") {
    val df = ops.SkewJoin.j8SkewedSaltedJoin(spark, sfTest)
    val plan = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
    // the salt replication survives optimization as a Generate
    // (explode) on the dim side...
    assert(plan.collect { case g: Generate => g }.nonEmpty,
      "salt-replication explode missing from plan")
    // ...and the equi-join condition includes the salt column
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    assert(joins.exists(_.condition.exists(
        _.references.exists(_.name == "__salt"))),
      "join condition does not include __salt")
    // row-identical to the plain join
    val expected = {
      val fact = Tables.orders(spark, sfTest).select(
        when(col("o_orderkey") % 10 < 9, 0L)
          .otherwise(pmod(col("o_orderkey"), lit(97L))).as("k"),
        col("o_totalprice"))
      val dim = spark.range(0, 97).select(col("id").as("k"),
        concat(lit("seg_"), col("id")).as("seg_name"))
      fact.join(dim, "k").groupBy("seg_name")
        .agg(count(lit(1)).as("n_orders"),
          ops.Det.dsum2(col("o_totalprice")).as("sum_total"))
    }
    assert(df.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(df).count() == 0)
  }

  test("j9 AQE skew-join: runtime split visible in the adaptive plan, " +
      "values identical to j8's salted join") {
    val df = ops.SkewJoin.j9SkewedAqeJoin(spark, sfTest)
    // AQE finalizes the plan during execution — run it first
    val rows = df.collect()
    assert(rows.length == 97)
    val finalPlan = df.queryExecution.executedPlan.toString
    // OptimizeSkewedJoin marks the join node and fans the hot
    // partition's reader out — the physical evidence AQE actually
    // split the 90%-hot-key shuffle block at runtime
    assert(finalPlan.contains("skew=true"),
      s"AQE did not mark the join skewed:\n$finalPlan")
    // same values as the manual-salting route (both are physical-only
    // rewrites of the same logical join)
    val salted = ops.SkewJoin.j8SkewedSaltedJoin(spark, sfTest)
    assert(df.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(df).count() == 0)
  }

  test("salted join spreads the hot key in the shuffle-join regime") {
    import spark.implicits._
    // force the shuffle path (the regime salting exists for — with a
    // broadcast dim there is no shuffle to skew)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val large = spark.range(20000)
        .select(when($"id" % 10 < 9, 0L).otherwise($"id" % 97).as("k"),
          $"id".as("payload"))
      val dim = spark.range(0, 97).select($"id".as("k"),
        concat(lit("n_"), $"id").as("name"))
      val salted = ops.SkewJoin.saltedJoin(large, dim, "k", salts = 8)
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val joins = salted.queryExecution.optimizedPlan
        .collect { case j: Join => j }
      assert(joins.exists(_.condition.exists(
        _.references.exists(_.name == "__salt"))))
      // the 18k-row hot key is split into 8 salt groups, each a
      // bounded fraction of the key — the per-task bound at scale
      val groups = large
        .withColumn("__salt",
          pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(8)))
        .filter($"k" === 0L)
        .groupBy("__salt").count().collect()
      assert(groups.length == 8, s"expected 8 salt groups: ${groups.length}")
      val counts = groups.map(_.getLong(1))
      assert(counts.max < 18000 * 0.25,
        s"hot key not spread: max salt group ${counts.max} of 18000")
      assert(salted.count() == large.count()) // inner join, dim covers all keys
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("w2b high-cardinality window: one Window node, rows preserved") {
    val df = ops.Aggregates.w2bWindowHighCard(spark, sfTest)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }
    assert(wins.size == 1,
      s"seven analytic funcs must share ONE Window, got ${wins.size}")
    assert(df.count() == Tables.orders(spark, sfTest).count())
    // the partition key scales with the data (not a fixed enum)
    val nKeys = df.select("o_custkey").distinct().count()
    assert(nKeys > 100, s"only $nKeys window groups")
  }

  test("salted join equals plain join on a skewed key") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val large = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(0L).as("k"),
        $"id".as("payload"))
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "name")
    val plain = large.join(small, Seq("k"), "inner")
    val salted = ops.SkewJoin.saltedJoin(large, small, "k", salts = 8)
      .select(plain.columns.map(col).toSeq: _*)
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    // left_anti is safe (unmatched LARGE rows only); right/full outer
    // would emit unmatched small rows once per salt replica — rejected
    val anti = ops.SkewJoin.saltedJoin(large, small, "k", 8, "left_anti")
    val plainAnti = large.join(small, Seq("k"), "left_anti")
    assert(anti.count() == plainAnti.count())
    intercept[IllegalArgumentException] {
      ops.SkewJoin.saltedJoin(large, small, "k", 8, "right_outer")
    }
    intercept[IllegalArgumentException] {
      ops.SkewJoin.saltedJoin(large, small, "k", 8, "full_outer")
    }
  }

  test("x42 dataset card: exact counts, order stats match a direct sort") {
    import org.apache.spark.sql.functions._
    val card = text.TextAnalysis.x42DatasetCard(spark, sfSmoke)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card.size == 10)
    val docs = Tables.documents(spark, sfSmoke)
    val n = docs.count()
    assert(card("n_docs") == n.toDouble)
    assert(card("total_chars") ==
      docs.agg(sum("n_chars")).head().getLong(0).toDouble)
    assert(card("exact_dup_fraction") >= 0.0 &&
      card("exact_dup_fraction") < 1.0)
    // k-th-smallest order stats vs a direct local sort
    val lens = docs.select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0)).sorted
    assert(card("median_tokens") == lens(((n + 1) / 2 - 1).toInt).toDouble)
    assert(card("p95_tokens") ==
      lens(((19 * n + 19) / 20 - 1).toInt).toDouble)
    assert(card("top_lang_share") > 0.0 && card("top_lang_share") <= 1.0)
  }

  test("x48 domain reweight: Gibbs non-negativity, conservation, " +
      "normalized monotone weights") {
    val r = graft.text.TextAnalysis.x48DomainReweight(spark, sfTest)
      .collect()
    val sources = Tables.documents(spark, sfTest)
      .select("source").distinct().count()
    assert(r.length == sources)
    // excess NLL ≥ 0 for every domain (Gibbs' inequality — a domain's
    // own unigram LM can't lose to the corpus LM on its own stream)
    r.foreach(row => assert(row.getDouble(3) >= 0.0, s"negative: $row"))
    // token conservation and a normalized mixture
    val tokTotal = Tables.documents(spark, sfTest)
      .select(explode(split(col("text"), " ")).as("t")).count()
    assert(r.map(_.getLong(2)).sum == tokTotal)
    val wSum = r.map(_.getDouble(4)).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum to $wSum")
    // monotone in the update's inputs: ordering by weight/share ratio
    // must equal ordering by excess (the (1+excess) step, normalized)
    val byRatio = r.sortBy(row =>
      row.getDouble(4) / row.getLong(2).toDouble).map(_.getString(0))
    val byExcess = r.sortBy(_.getDouble(3)).map(_.getString(0))
    assert(byRatio.toSeq == byExcess.toSeq)
  }

  test("t1 union equals f2-style isin filter (SURVEY T1 ≡ F2)") {
    val union = ops.Joins.t1Union(spark, sfTest).select("c_custkey")
    val isin = Tables.customer(spark, sfTest)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select("c_custkey")
    assert(union.exceptAll(isin).count() == 0)
    assert(isin.exceptAll(union).count() == 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** HLL shard-rollup invariants — the properties that make the sketch
  * path trustworthy at 100 TB, pinned at test SF. */
class SketchesSpec extends SparkTestBase {

  test("x18: merged shard sketches equal the single-shot sketch exactly") {
    val dir = sfTest
    val rolled = Sketches.x18SketchRollup(spark, dir)
      .filter(col("shard") === -1)
      .select("distinct_est").as[Long](spark.implicits.newLongEncoder)
      .head()
    // one sketch over the whole table, no sharding
    val oneShot = Tables.documents(spark, dir)
      .agg(hll_sketch_estimate(
        hll_sketch_agg(md5(col("text")))).as("est"))
      .select("est").as[Long](spark.implicits.newLongEncoder)
      .head()
    // register-max merge is associative + commutative: splitting the
    // corpus into shards and merging MUST reproduce the one-shot
    // sketch bit-for-bit (equality, not tolerance)
    assert(rolled === oneShot,
      s"shard rollup $rolled != single-shot $oneShot")
  }

  test("x18: estimate within HLL error envelope of the exact distinct") {
    val dir = sfTest
    val exact = Tables.documents(spark, dir)
      .select(md5(col("text")).as("fp")).distinct().count()
    val est = Sketches.x18SketchRollup(spark, dir)
      .filter(col("shard") === -1)
      .select("distinct_est").as[Long](spark.implicits.newLongEncoder)
      .head()
    // default lgK=12 → RSE ≈ 1.04/sqrt(4096) ≈ 1.6%; 5% is >3σ
    val relErr = math.abs(est.toDouble - exact) / exact
    assert(relErr < 0.05, s"est $est vs exact $exact: relErr $relErr")
  }

  test("x19: merged shard CMS answers equal the one-shot sketch; " +
      "estimates sit in the one-sided CMS envelope") {
    import org.apache.spark.util.sketch.CountMinSketch
    val dir = sfTest
    val out = Sketches.x19CmsRollup(spark, dir).collect()
    assert(out.length === 20)
    // one sketch over the whole corpus, no sharding — counter
    // addition is commutative+associative, so the rollup must agree
    // exactly on every probe (and on the total stream length)
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
    val oneShotBytes = toks
      .agg(expr("count_min_sketch(token, 0.001d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val oneShot = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(oneShotBytes))
    val n = toks.count()
    assert(oneShot.totalCount() === n)
    val maxOver = math.ceil(0.001 * n).toLong
    out.foreach { r =>
      val (token, exact, est) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est === oneShot.estimateCount(token),
        s"rollup != one-shot for '$token'")
      // CMS never undercounts; over-count bounded by ε·N (δ=0.01
      // per probe — deterministic here: fixed corpus, fixed seed)
      assert(est >= exact, s"undercount for '$token': $est < $exact")
      assert(est - exact <= maxOver,
        s"'$token' over-counts by ${est - exact} > εN=$maxOver")
    }
  }

  test("x27: KLL quantiles inside the rank envelope; n/min/max exact") {
    val dir = sfTest
    val out = Sketches.x27KllRollup(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    val vals = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val n = vals.length
    // 17 rows: 16 shards + global; shard ns partition the table
    assert(out.size == Sketches.Shards + 1)
    assert(out.filterKeys(_ >= 0).values.map(_.getLong(1)).sum == n)
    val g = out(-1)
    assert(g.getLong(1) == n)          // KLL tracks n exactly
    assert(g.getDouble(2) == vals.head) // min exact
    assert(g.getDouble(7) == vals.last) // max exact
    // rank envelope: the true rank of each estimated quantile must
    // sit within ±5% of its target (k=400 KLL 99% bound ≈ 0.87%;
    // merging ≤17 sketches degrades it by a small constant — 5% is
    // far outside any realistic draw of the compaction coin flips)
    Seq(0.25 -> g.getDouble(3), 0.5 -> g.getDouble(4),
      0.75 -> g.getDouble(5), 0.95 -> g.getDouble(6)).foreach {
      case (q, est) =>
        val trueRank = vals.count(_ <= est).toDouble / n
        assert(math.abs(trueRank - q) < 0.05,
          s"q=$q est=$est landed at rank $trueRank")
    }
    // quantiles are monotone and bracketed by min/max
    assert(g.getDouble(2) <= g.getDouble(3) &&
      g.getDouble(3) <= g.getDouble(4) &&
      g.getDouble(4) <= g.getDouble(5) &&
      g.getDouble(5) <= g.getDouble(6) &&
      g.getDouble(6) <= g.getDouble(7))
  }

  test("x52: KMV overlap estimates inside the 1/sqrt(k) envelope of " +
    "exact, in the TRUE sketch regime, deterministically") {
    import graft.ops.KmvSketch
    // sf0.1: 1500 distinct users >> k=256 — every sketch is full, so
    // this exercises the ESTIMATOR, not the under-full exact path
    val dir = "/root/testdata/sf0.1"
    val out = KmvSketch.x52AudienceOverlap(spark, dir).collect()
    assert(out.length == 10, "5 event types -> 10 unordered pairs")
    // exact truths per pair via plain distinct SQL
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select("event_type", "user_id").distinct().cache()
    def exact(t: String): Set[Long] = ev
      .filter(col("event_type") === t)
      .select("user_id").collect().map(_.getLong(0)).toSet
    val sets = out.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.map(t => t -> exact(t)).toMap
    // 1/sqrt(k-2) ~ 6.3%; allow 4 sigma on cardinalities, and a
    // looser bound on the intersection (two estimation stages)
    val tol = 4.0 / math.sqrt(KmvSketch.K - 2.0)
    out.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (a, b) = (sets(ta), sets(tb))
      def rel(est: Double, t: Long): Double =
        math.abs(est - t) / math.max(t, 1L)
      assert(rel(r.getDouble(2), a.size) < tol, s"$ta d_a ${r.getDouble(2)} vs ${a.size}")
      assert(rel(r.getDouble(3), b.size) < tol, s"$tb d_b ${r.getDouble(3)} vs ${b.size}")
      assert(rel(r.getDouble(4), (a ++ b).size) < tol,
        s"$ta|$tb union ${r.getDouble(4)} vs ${(a ++ b).size}")
      assert(rel(r.getDouble(5), (a & b).size) < 2 * tol,
        s"$ta&$tb intersect ${r.getDouble(5)} vs ${(a & b).size}")
    }
    ev.unpersist()
    // deterministic: bit-identical on re-evaluation
    val again = KmvSketch.x52AudienceOverlap(spark, dir).collect()
    assert(out.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  test("x52 plan shape: partial sketch aggregation runs map-side, " +
    "shuffle carries k-entry buffers not raw hashes") {
    import graft.ops.KmvSketch
    val df = Tables.events(spark, sfSmoke)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        pmod(xxhash64(col("user_id")), lit(1L << 31)).as("h"))
      .groupBy("event_type")
      .agg(KmvSketch.kmv(KmvSketch.K)(col("h")).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    // typed-Aggregator path: ObjectHashAggregate with a PARTIAL stage
    // before the exchange — the per-partition bottom-k is what makes
    // the shuffle O(k per partition per group) instead of O(rows)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregate stages:\n$plan")
    assert(plan.contains("Exchange"), plan)
  }

  test("x52 kmv aggregator: trim soundness — bottom-k survives any " +
    "insertion order and partition split") {
    import graft.ops.KmvSketch
    val k = 8
    val agg = KmvSketch.kmvAgg(k)
    val vals = (1L to 100L).map(v => v * 7919L % 1000L).distinct
    val expect = vals.sorted.take(k)
    // one pass, adversarial descending order (max trims churn)
    val b1 = vals.sortBy(-_).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b1) == expect)
    // split across "partitions" and merge in the other order
    val (l, r) = vals.splitAt(vals.size / 3)
    val m = agg.merge(
      r.foldLeft(agg.zero)(agg.reduce),
      l.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(m) == expect)
  }

  test("x52 estimator envelope survives adversarial id domains: " +
    "sequential, strided, clustered, high-bit, multiplicity-invariant") {
    import graft.ops.KmvSketch
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val k = KmvSketch.K
    // driver twin of avalancheExpr — pinned against the SQL path
    // once below, then used for the sweep (40 domains of up to 50k
    // ids driver-side instead of 40 Spark jobs)
    def h(v: Long): Long =
      java.lang.Math.floorMod(XXH64.hashLong(v, 42L),
        KmvSketch.HashDomain)
    val pinIds = Seq(0L, 1L, -1L, 1234567890123L, Long.MinValue)
    val sparkHashes = {
      import spark.implicits._
      pinIds.toDF("v")
        .select(KmvSketch.avalancheExpr(col("v")))
        .collect().map(_.getLong(0)).toSeq
    }
    assert(sparkHashes == pinIds.map(h),
      "driver XXH64 twin drifted from the SQL avalanche hash")
    def est(ids: Iterable[Long]): Double = {
      val sk = ids.iterator.map(h).toArray.distinct.sorted.take(k)
      KmvSketch.distinctEst(sk.toIndexedSeq, k)
    }
    // the envelope the estimator promises: se = 1/sqrt(k-2) ~ 6.3%,
    // asserted at 3 sigma over every fixed (deterministic) domain
    val tol = 3.0 / math.sqrt(k - 2.0)
    def check(label: String, ids: Iterable[Long], d: Long): Unit = {
      val e = est(ids)
      assert(math.abs(e - d) / d < tol,
        s"$label: estimate $e for $d distinct (rel " +
          s"${math.abs(e - d) / d}, tol $tol)")
    }
    // sequential runs — the domain that breaks shift-based mixes
    // (the x52 lesson): consecutive ids from varied starts and sizes
    for (start <- Seq(0L, 1000000000L, -500000000L);
         d <- Seq(3000L, 20000L, 50000L))
      check(s"seq($start,$d)", start until (start + d), d)
    // strided — power-of-two and near-power strides stress avalanche
    for (stride <- Seq(2L, 64L, 4096L, 65537L, 1L << 32);
         d <- Seq(5000L, 30000L))
      check(s"stride($stride,$d)", (0L until d).map(_ * stride), d)
    // clustered — many tight runs far apart (user-id block allocation)
    for ((nc, w) <- Seq((100, 50), (500, 40), (40, 1000))) {
      val ids = for (c <- 0 until nc; o <- 0 until w)
        yield c.toLong * 1000003L + o
      check(s"cluster($nc,$w)", ids, nc.toLong * w)
    }
    // high-bit-only — ids living entirely above the low 32 bits
    for (shift <- Seq(20, 32, 40))
      check(s"highbit($shift)", (1L to 10000L).map(_ << shift), 10000L)
    // multiplicity invariance: a zipf-duplicated stream must give
    // the IDENTICAL estimate as its distinct set (set semantics) —
    // equality, not tolerance
    val base = (0L until 10000L).map(_ * 7919L)
    val zipf = base.zipWithIndex.flatMap { case (v, i) =>
      Seq.fill(1 + 3000 / (i + 1))(v)
    }
    assert(est(zipf) == est(base),
      "duplicate multiplicity moved a distinct-set estimate")
  }

  test("x18: shard doc counts partition the corpus; shape is stable") {
    val dir = sfTest
    val rows = Sketches.x18SketchRollup(spark, dir)
    val total = Tables.documents(spark, dir).count()
    val shardSum = rows.filter(col("shard") >= 0)
      .agg(sum("n_docs")).head().getLong(0)
    val globalN = rows.filter(col("shard") === -1)
      .head().getAs[Long]("n_docs")
    assert(shardSum === total && globalN === total)
    assert(rows.count() === Sketches.Shards + 1)
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Mergeable cardinality sketches — the shard-rollup pattern a
  * 100 TB corpus store runs daily: each ingest shard aggregates its
  * documents into ONE fixed-size HLL sketch (Apache DataSketches HLL
  * via Spark's `hll_sketch_agg`, ~2^lgK bytes regardless of input
  * size), the sketches persist beside the shard's manifest, and any
  * later "how many unique documents across shards X..Y" question is
  * answered by merging those sketches — NO rescan of the raw corpus.
  *
  * Why this scales where exact distinct doesn't: exact
  * count(DISTINCT) over 100 TB shuffles every distinct key once
  * (the dedup d1 path — right when you need the keys themselves);
  * the sketch path moves 16 KiB per shard however big the shards
  * are, and the merge is register-wise max — commutative,
  * associative, and idempotent, so re-merging overlapping scopes
  * never double-counts. The estimate is deterministic: DataSketches
  * HLL has no run-time randomness (hash seed is fixed), and
  * register-max is order-independent, so the same corpus always
  * yields the same estimate — SketchesSpec pins merged-vs-single-shot
  * EQUALITY, not closeness.
  *
  * Gate: rows-only by contract (DuckDB's HLL internals differ — no
  * cross-engine hash possible for estimates); SketchesSpec carries
  * the rigor: merge associativity (shard rollup == one-shot sketch)
  * and a relative-error bound vs the exact distinct count.
  */
object Sketches {

  /** Documents' content identity — the same md5-of-text fingerprint
    * d1 exact dedup groups on (one identity for dedup AND counting). */
  private def fingerprint = md5(col("text"))

  val Shards = 16

  /** Per-shard sketch build — what the ingest job would persist. The
    * shard key is the same xxhash64 mix every other shard-routing op
    * in the repo uses (x17 training shards, o3 sampling). */
  def shardSketches(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(pmod(xxhash64(col("doc_id")), lit(Shards))
        .cast("int").as("shard"))
      .agg(hll_sketch_agg(fingerprint).as("sk"),
        count(lit(1)).as("n_docs"))

  /** x18 — shard sketches + the merged global rollup (shard = -1),
    * one row per scope: (shard, n_docs, distinct_est). The global
    * row touches ONLY the 16 shard sketches, never the documents —
    * the plan shows one scan feeding both levels. */
  def x18SketchRollup(s: SparkSession, dir: String): DataFrame = {
    val shards = shardSketches(s, dir)
    val global = shards.agg(
      sum("n_docs").as("n_docs"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("distinct_est"))
      .select(lit(-1).cast("int").as("shard"), col("n_docs"),
        col("distinct_est"))
    shards.select(col("shard"), col("n_docs"),
        hll_sketch_estimate(col("sk")).as("distinct_est"))
      .unionByName(global)
  }

  /** X18B — the HLL EXACTNESS ORACLE GATE (completing the sketch-
    * gate trio with x19b/x27b): the IDENTICAL x18 rollup — per-shard
    * `hll_sketch_agg`, `hll_union_agg` merge, estimate read-out —
    * over a domain bounded far under the sketch's sparse-mode
    * capacity (token length capped at 30 → ≤31 distinct keys per
    * scope vs lgConfigK=12's hundreds-of-coupons promotion
    * threshold). DataSketches HLL below promotion is a COUPON LIST:
    * it stores the distinct hash set outright and its estimate is
    * the exact count — no register approximation ever engages — so
    * every per-shard and merged estimate equals count(DISTINCT) and
    * the oracle is plain SQL. This value-gates the build, the
    * cross-shard union, and the read-out; the open-domain x18 keeps
    * its envelope + merge-equality contract in SketchesSpec. Shard
    * routing uses the o3 Knuth key-mix (xxhash64 is Spark-only; the
    * per-shard rows must replay in SQL). */
  def x18bHllExactGate(s: SparkSession, dir: String): DataFrame = {
    // doc_id masked into [0, 2³¹) before the Knuth multiply — same
    // Int64-overflow guard as the x27b slice key (ADVICE r9)
    val keyed = Tables.documents(s, dir)
      .select((shiftright(pmod(col("doc_id"), lit(2147483648L))
          * 2654435761L, 16) % Shards)
        .cast("int").as("shard"),
        explode(split(col("text"), " ")).as("token"))
      .select(col("shard"),
        least(length(col("token")), lit(30)).cast("string").as("k"))
    val shards = keyed.groupBy("shard")
      .agg(hll_sketch_agg(col("k")).as("sk"),
        count(lit(1)).as("n_rows"))
    val global = shards.agg(
      sum("n_rows").as("n_rows"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("distinct_est"))
      .select(lit(-1).cast("int").as("shard"), col("n_rows"),
        col("distinct_est"))
    shards.select(col("shard"), col("n_rows"),
        hll_sketch_estimate(col("sk")).as("distinct_est"))
      .unionByName(global)
  }

  /** Exploded whitespace tokens with their shard — the same token
    * stream x7/x9 count, so the sketch estimates are comparable to
    * exact counts. */
  private def shardedTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(pmod(xxhash64(col("doc_id")), lit(Shards))
        .cast("int").as("shard"),
        explode(split(col("text"), " ")).as("token"))

  /** CMS dials: ε=0.001 → over-count ≤ ε·N with prob 1−δ (δ=0.01);
    * ~110 KiB per sketch regardless of input size. Seed fixed → the
    * whole pipeline is deterministic (CMS hashing has no runtime
    * randomness), so SketchesSpec pins merge EQUALITY like x18. */
  private val CmsAgg = "count_min_sketch(token, 0.001d, 0.99d, 42)"

  /** x19 — mergeable FREQUENCY sketch rollup, the point-query
    * companion to x18's cardinality rollup: each ingest shard folds
    * its token stream into ONE fixed-size count-min sketch (Spark's
    * built-in `count_min_sketch` aggregate — partial aggregation
    * merges sketches map-side, so the shuffle moves 16 sketches, not
    * tokens), the shard sketches are merged by cell-wise counter
    * addition — commutative and associative, so shard rollup ==
    * one-shot sketch EXACTLY — and any later "how often does token t
    * occur across shards X..Y" is answered from the merged 110 KiB
    * summary with no corpus rescan, est ∈ [exact, exact + ε·N].
    *
    * The merge itself: Spark SQL has no cms-merge aggregate (unlike
    * `hll_union_agg`), so the 16 shard sketches — fixed-size rows
    * whose count does NOT grow with the corpus — are folded
    * driver-side via `CountMinSketch.mergeInPlace`, the same bounded-
    * collect pattern as n4's codebook fit. Probes are x7's exact
    * top-20 tokens, so the output carries its own ground truth:
    * (token, exact_count, est_count). Rows-only by contract (sketch
    * internals are engine-specific); SketchesSpec pins merge equality
    * and the one-sided error envelope. */
  def x19CmsRollup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val toks = shardedTokens(s, dir)
    val sketches = toks.groupBy("shard").agg(expr(CmsAgg).as("sk"))
      .select("sk").collect()
      .map(r => CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
    val merged = sketches.reduce { (a, b) => a.mergeInPlace(b); a }
    val probes = toks.groupBy("token")
      .agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("token")).limit(20)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        merged.estimateCount(r.getString(0))))
    s.createDataFrame(probes.toSeq)
      .toDF("token", "exact_count", "est_count")
  }

  /** KLL dial: k=400 → single-sketch 99%-confidence rank error
    * ≈0.87% (DataSketches KLL table), a few KiB per sketch regardless
    * of input size. */
  private val KllK = 400

  /** x27 — mergeable QUANTILE sketch rollup (DataSketches KLL,
    * Karnin-Lang-Liberty 2016), completing the shard-summary trio:
    * x18 answers "how many distinct", x19 "how often does t occur",
    * x27 "what does the distribution look like" — percentiles of
    * l_extendedprice per ingest shard and globally, from fixed-size
    * summaries, no corpus rescan.
    *
    * Shape: sketches build PARTITION-LOCALLY (one pass, a HashMap of
    * ≤ Shards sketches per task — the x9 Misra-Gries pattern), merge
    * per shard via groupByKey (the shuffle moves sketch blobs, never
    * values), and the ≤ `Shards` fixed-size shard blobs fold
    * driver-side into the global summary (the x19 bounded-collect
    * pattern — the collect is Shards × a-few-KiB by construction).
    *
    * Unlike HLL/CMS, KLL compaction is RANDOMIZED (unseeded coin
    * flips pick which half of a level survives), so SketchesSpec
    * pins the paper's guarantee rather than replay equality: every
    * estimated quantile's true rank within ±5% of target (>5× the
    * 99% bound at k=400 — not a flake surface), and the exact-by-
    * design invariants: per-shard n is exact, min/max are exact.
    * Rows-only gate (17 rows: 16 shards + the global rollup). */
  def x27KllRollup(s: SparkSession, dir: String): DataFrame =
    kllRollupOf(s, Tables.lineitem(s, dir)
      .select(pmod(xxhash64(col("l_orderkey")), lit(Shards))
          .cast("int").as("shard"),
        col("l_extendedprice").cast("double").as("v")))

  /** The x27 kernel over an arbitrary (shard int, v double) frame —
    * shared by the full rollup and the x27b exactness gate. */
  private def kllRollupOf(s: SparkSession, input: DataFrame): DataFrame = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    import s.implicits._
    val rows = input.as[(Int, Double)]
    val partial = rows.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap
        .empty[Int, KllDoublesSketch]
      it.foreach { case (sh, v) =>
        m.getOrElseUpdate(sh,
          KllDoublesSketch.newHeapInstance(KllK)).update(v)
      }
      m.iterator.map { case (sh, sk) => (sh, sk.toByteArray) }
    }
    val shardBlobs = partial.groupByKey(_._1)
      .mapGroups { (sh, it) =>
        val sk = KllDoublesSketch.newHeapInstance(KllK)
        it.foreach { case (_, b) =>
          sk.merge(KllDoublesSketch.heapify(Memory.wrap(b))) }
        (sh, sk.toByteArray)
      }
      .collect()   // ≤ Shards blobs of a few KiB — bounded by construction
      .sortBy(_._1)
    val sketches = shardBlobs.map { case (sh, b) =>
      (sh, KllDoublesSketch.heapify(Memory.wrap(b))) }
    val global = KllDoublesSketch.newHeapInstance(KllK)
    sketches.foreach { case (_, sk) => global.merge(sk) }
    val out = (sketches :+ ((-1, global))).map { case (sh, sk) =>
      (sh, sk.getN, sk.getMinItem, sk.getQuantile(0.25),
        sk.getQuantile(0.5), sk.getQuantile(0.75),
        sk.getQuantile(0.95), sk.getMaxItem)
    }
    s.createDataFrame(out.toIndexedSeq)
      .toDF("shard", "n_rows", "v_min", "p25", "p50", "p75", "p95",
        "v_max")
  }

  /** Row budget of the x27b gate slice: far under the KLL capacity
    * (k = 400), so no compaction — the one randomized mechanism in
    * the KLL stack — can ever trigger, for the slice OR the merged
    * global (200 retained items ≤ k). */
  private val KllGateRows = 200

  /** X27B — the KLL EXACTNESS ORACLE GATE (the x9b/x19b bounded
    * pattern, for the quantile sketch; bounded COUNT this time, not
    * domain — KLL's error comes from compaction, which only fires
    * past capacity): the IDENTICAL x27 machinery — partition-local
    * sketch build, shard merge via groupByKey, driver-side fold into
    * the global summary — over a deterministic [[KllGateRows]]-row
    * slice of lineitem (hash-ordered top-200, constant at every SF).
    * Below capacity every sketch RETAINS all items, so getQuantile
    * is the exact order statistic under the library's inclusive-rank
    * rule — quantile(p) = the value at sorted position ⌈p·n⌉ — and
    * the oracle is a plain window-rank SQL over the same slice.
    * Slice selection uses the o3 Knuth multiplicative key-mix (the
    * repo's SQL-replayable hash; xxhash64 is Spark-only), over the
    * unique (l_orderkey, l_linenumber) row key — MASKED into [0, 2³¹)
    * before the multiply, because the raw key × 2654435761 would
    * overflow Int64 once l_orderkey passes ~4.3·10⁸ (SF ≈ 70), where
    * Spark wraps silently but DuckDB bigint arithmetic raises, so the
    * gate's any-SF oracle contract would break exactly where it
    * matters (ADVICE r9). The mask keeps the product ≤ 2³¹·2654435761
    * < 2⁶³ on both engines at every SF. This value-gates the
    * whole x27 path (per-task build, blob serialization round-trip,
    * shard merge, driver rollup, the quantile read-out); the
    * full-corpus x27 keeps its honest rank-error envelope contract
    * in SketchesSpec. */
  def x27bKllExactGate(s: SparkSession, dir: String): DataFrame = {
    val mix = shiftright(
      pmod(col("l_orderkey") * 8 + col("l_linenumber"),
        lit(2147483648L)) * 2654435761L, 16)
    val slice = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("double").as("v"), mix.as("h"))
      .orderBy(col("h"), col("l_orderkey"), col("l_linenumber"))
      .limit(KllGateRows)
    kllRollupOf(s, slice.select(
      pmod(col("h"), lit(Shards)).cast("int").as("shard"),
      col("v")))
  }

  /** X19B — the CMS EXACTNESS ORACLE GATE (the x9b bounded-domain
    * pattern, for the frequency sketch): run the IDENTICAL sharded
    * count_min_sketch build + driver-side mergeInPlace rollup over a
    * key domain bounded far under the sketch's width (token length
    * capped at 30 → ≤31 keys vs Spark's CountMinSketch.create(eps =
    * 0.001, confidence = 0.99) geometry: width ⌈2/ε⌉ = 2000, depth
    * ⌈ln(1/(1−0.99))/ln 2⌉ = 7 — Spark uses the 2/ε convention, not
    * Cormode–Muthukrishnan's e/ε). A CMS point query over-counts a
    * key only if that key collides with another in EVERY row —
    * p ≈ (31/2000)⁷ ≈ 4·10⁻¹³ per key, and deterministic for the
    * fixed seed 42 over the FIXED key strings "0".."30" (the key set
    * is corpus-independent, so collision-freeness is a property of
    * the seed, not the data), so every estimate equals the exact
    * count and the oracle is the plain GROUP BY. This value-gates Spark's sketch aggregate, the
    * map-side partial merges, and the driver rollup; the open-domain
    * x19 keeps its honest envelope contract. */
  def x19bCmsGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val keyed = shardedTokens(s, dir)
      .select(col("shard"),
        least(length(col("token")), lit(30)).cast("string").as("k"))
    val sketches = keyed.groupBy("shard")
      .agg(expr("count_min_sketch(k, 0.001d, 0.99d, 42)").as("sk"))
      .select("sk").collect()
      .map(r => CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
    val merged = sketches.reduce { (a, b) => a.mergeInPlace(b); a }
    // ≤31 probe keys by construction — bounded collect
    val keys = keyed.select("k").distinct().collect()
      .map(_.getString(0)).sorted
    s.createDataFrame(
        keys.toSeq.map(k => (k, merged.estimateCount(k))))
      .toDF("len_key", "est_count")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x18_sketch_rollup" -> x18SketchRollup,
    "x18b_hll_exact_gate" -> x18bHllExactGate,
    "x19_cms_rollup" -> x19CmsRollup,
    "x19b_cms_gate" -> x19bCmsGate,
    "x27_kll_rollup" -> x27KllRollup,
    "x27b_kll_exact_gate" -> x27bKllExactGate)

  /** Open-domain estimates are engine-specific — rows-only by
    * contract; the bounded gates have closed forms. */
  val oracle: Map[String, String] = Map(
    // sparse-mode HLL = an exact coupon list; every estimate equals
    // the plain COUNT(DISTINCT) over the ≤31-key bounded domain
    "x18b_hll_exact_gate" ->
      s"""WITH keyed AS (
           SELECT cast((((doc_id % 2147483648) * 2654435761) >> 16)
               % $Shards AS int) AS shard,
             cast(least(length(token), 30) AS varchar) AS k
           FROM (SELECT doc_id,
                   unnest(string_split(text, ' ')) AS token
                 FROM documents)),
         shards AS (
           SELECT shard, cast(count(*) AS bigint) AS n_rows,
             cast(count(DISTINCT k) AS bigint) AS distinct_est
           FROM keyed GROUP BY 1)
         SELECT shard, n_rows, distinct_est FROM shards
         UNION ALL
         SELECT cast(-1 AS int),
           cast(sum(n_rows) AS bigint),
           (SELECT cast(count(DISTINCT k) AS bigint) FROM keyed)
         FROM shards""",
    // below-capacity KLL = exact order statistics; quantile(p) is
    // the value at inclusive-rank position ceil(p·n) per scope
    "x27b_kll_exact_gate" -> {
      def q(p: String) =
        s"max(CASE WHEN rn = ceiling($p * n) THEN v END) AS "
      s"""WITH slice AS (
           SELECT h, v FROM (
             SELECT (((l_orderkey * 8 + l_linenumber) % 2147483648)
                 * 2654435761) >> 16 AS h,
               cast(l_extendedprice AS double) AS v,
               l_orderkey, l_linenumber
             FROM lineitem)
           ORDER BY h, l_orderkey, l_linenumber LIMIT $KllGateRows),
         sharded AS (
           SELECT cast(h % $Shards AS int) AS shard, v FROM slice),
         scopes AS (
           SELECT shard, v FROM sharded
           UNION ALL SELECT cast(-1 AS int), v FROM sharded),
         ranked AS (
           SELECT shard, v,
             row_number() OVER (PARTITION BY shard ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY shard) AS n
           FROM scopes)
         SELECT shard, cast(max(n) AS bigint) AS n_rows,
           min(v) AS v_min,
           ${q("0.25")}p25,
           ${q("0.5")}p50,
           ${q("0.75")}p75,
           ${q("0.95")}p95,
           max(v) AS v_max
         FROM ranked GROUP BY shard"""
    },
    "x19b_cms_gate" ->
      """SELECT cast(least(length(token), 30) AS varchar) AS len_key,
           cast(count(*) AS bigint) AS est_count
         FROM (SELECT unnest(string_split(text, ' ')) AS token
               FROM documents)
         GROUP BY 1""")
}

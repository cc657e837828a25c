package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fixed-iteration PageRank — link-authority scoring, the classic
  * iterative-join workload (Page et al. 1999; at corpus-curation
  * scale the same computation ranks crawl domains for quality
  * weighting, e.g. CommonCrawl's harmonic-centrality ranking). The
  * graph here is the customer→supplier purchase graph (distinct
  * (o_custkey, l_suppkey) pairs through orders⋈lineitem), node ids
  * disjoint by an offset.
  *
  * Numerics are the repo's determinism pattern taken to iterative
  * fixpoint: ranks live as BIGINT micro-units (SCALE = 1e12), every
  * per-edge contribution is `floor((0.85 · r) / outdeg)` — the
  * double product/quotient is identical IEEE arithmetic in both
  * engines and the floor lands it back on integers — so the
  * per-node SUM is order-independent integer addition and five
  * iterations stay bit-identical between Spark and the DuckDB
  * oracle (which unrolls the same update as chained CTEs, generated
  * from the same Scala loop). Dangling mass (suppliers have no
  * out-edges) redistributes uniformly, the textbook treatment: one
  * scalar aggregate per iteration.
  *
  * Spark shape at scale: edges build once (one distinct over the
  * fact join), pre-partitioned on src and cached so every round's
  * keyed join reuses ONE partitioning. The iterated state is
  * (node_id, outdeg, r) — outdeg is static, so folding it into the
  * checkpointed state means no round ever re-joins the degree
  * table: the dangling-mass scalar is a filter+sum over the
  * checkpointed state alone, and the contribution join touches only
  * state⋈edges. Each round localCheckpoints its rank vector (the
  * d6 pattern): the dangling-mass scalar is an ACTION per round,
  * and an un-materialized plan would replay every earlier round
  * inside it — quadratic in the iteration count. */
object PageRank {

  private val Scale = 1000000000000L // 1e12 micro-units
  private val Iters = 5
  private val SuppOffset = 10000000L

  /** X34 — five PageRank iterations over the purchase graph;
    * emits (node_id, node_type, rank_q) for every node. */
  def x34PageRank(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        "o_orderkey")
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + SuppOffset).as("dst"))
      .distinct()
      // pre-partition on the per-round join key: the distinct's
      // (src,dst) partitioning would force a fresh edge shuffle every
      // iteration; keyed on src the cache satisfies all 5 rounds.
      // Explicit width (round 14): the cached partitioning is what
      // every round's contrib join and its downstream agg inherit, so
      // an AQE byte-coalesce here (edges are narrow longs) serializes
      // five rounds of join+agg compute — pin it at the session's
      // pre-coalesce width (graft.ops.Exchanges).
      .repartition(graft.ops.Exchanges.sessionShuffleWidth(s), col("src"))
      .cache()
    val nodes = edges.select(col("src").as("node_id"))
      .union(edges.select(col("dst").as("node_id")))
      .distinct()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // iterated state = (node_id, outdeg, r): outdeg is static, so
    // carrying it in the checkpointed state means no round re-joins
    // the degree table — built exactly once here
    val state0 = Rounds.materialize(nodes.as("nd")
      .join(outdeg.as("od"), col("nd.node_id") === col("od.src"), "left")
      .select(col("nd.node_id").as("node_id"), col("od.outdeg").as("outdeg")))
    val n = state0.count()
    // init + per-iteration constants, all integer micro-units
    val init = java.lang.Math.floorDiv(Scale, n)
    val base = math.floor(0.15 * Scale / n).toLong

    var ranks = state0.withColumn("r", lit(init))
    // the previous generation's materialized blocks — released as
    // soon as the next generation exists (see below)
    var prevGen = state0
    for (_ <- 1 to Iters) {
      // dangling nodes: no out-edges → their whole damped mass is
      // shared uniformly; a filter+sum over the checkpointed state
      // alone (one cheap scalar action per round, no join)
      val dang = ranks.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("r")), lit(0L)).as("d"))
        .head().getLong(0)
      val dangShare = math.floor(0.85 * dang / n).toLong
      // string-aliased refs: ranks' lineage re-joins the same cached
      // edges every round, and df("col")-style references would
      // capture stale attribute ids
      val contrib = ranks.filter(col("outdeg").isNotNull).as("wd")
        .join(edges.as("ed"), col("wd.node_id") === col("ed.src"))
        .select(col("ed.dst").as("node_id"),
          floor(lit(0.85) * col("wd.r") / col("wd.outdeg"))
            .cast("long").as("c"))
        .groupBy("node_id")
        .agg(sum(col("c")).as("cs"))
      // materialize each round: the dangling-mass head() is an ACTION
      // per iteration, so an un-checkpointed ranks plan would replay
      // rounds 1..k-1 inside round k's action (quadratic-in-rounds
      // work). Integer arithmetic ⇒ the checkpoint cannot change a
      // single bit of the result. Rounds.materialize = local or
      // reliable checkpoint per session conf (executor-loss safety
      // at cluster scale — RoundsSpec pins mode-identical output).
      ranks = Rounds.materialize(ranks.as("st").join(contrib.as("ct"),
          col("st.node_id") === col("ct.node_id"), "left")
        .select(col("st.node_id").as("node_id"),
          col("st.outdeg").as("outdeg"),
          (lit(base) + coalesce(col("ct.cs"), lit(0L)) + lit(dangShare))
            .as("r")))
      // generation k is materialized and lineage-free, so generation
      // k−1's blocks can go NOW — keeping all Iters generations
      // resident for the query's lifetime is what held x34 ~1.7×
      // above its quiet band in the round-8 driver bench
      Rounds.release(prevGen)
      prevGen = ranks
    }
    // ranks is checkpointed (independent of the edge lineage), so the
    // query-local edge cache can release its blocks NOW instead of
    // waiting for GC-driven cleanup — in a long-lived multi-query
    // session accumulated dead caches steal execution memory and turn
    // later joins spill-heavy (measured: q1 41.7 s in a 173-query
    // bench session vs 5.7 s solo at sf1.0)
    edges.unpersist()
    ranks
      .withColumn("node_type",
        when(col("node_id") >= SuppOffset, "supplier")
          .otherwise("customer"))
      .select(col("node_id"), col("node_type"),
        col("r").as("rank_q"))
  }

  /** The DuckDB oracle, generated by the same loop: it0 = uniform
    * init; each iteration restates base + floored edge contributions
    * + floored uniform dangling share. */
  private def oracleSqlText: String = {
    val edgeCte =
      s"""e AS (SELECT DISTINCT o.o_custkey AS src,
             l.l_suppkey + $SuppOffset AS dst
           FROM orders o JOIN lineitem l
             ON o.o_orderkey = l.l_orderkey),
         nd AS (SELECT src AS node_id FROM e
                UNION SELECT dst FROM e),
         nn AS (SELECT cast(count(*) AS bigint) AS n FROM nd),
         od AS (SELECT src, cast(count(*) AS bigint) AS outdeg
                FROM e GROUP BY 1),
         it0 AS (SELECT node_id,
                   cast($Scale // n AS bigint) AS r
                 FROM nd CROSS JOIN nn)"""
    val iters = (1 to Iters).map { i =>
      val p = s"it${i - 1}"
      s"""dg$i AS (SELECT cast(coalesce(sum(r), 0) AS bigint) AS d
             FROM $p LEFT JOIN od ON $p.node_id = od.src
             WHERE od.src IS NULL),
         ct$i AS (SELECT e.dst AS node_id,
             cast(sum(cast(floor((0.85 * r) / outdeg) AS bigint))
               AS bigint) AS cs
           FROM $p JOIN od ON $p.node_id = od.src
             JOIN e ON $p.node_id = e.src
           GROUP BY 1),
         it$i AS (SELECT nd.node_id,
             cast(cast(floor(0.15 * $Scale / n) AS bigint)
               + coalesce(cs, 0)
               + cast(floor(0.85 * d / n) AS bigint) AS bigint) AS r
           FROM nd CROSS JOIN nn CROSS JOIN dg$i
             LEFT JOIN ct$i ON nd.node_id = ct$i.node_id)"""
    }.mkString(",\n         ")
    s"""WITH $edgeCte,
         $iters
         SELECT node_id,
           CASE WHEN node_id >= $SuppOffset THEN 'supplier'
                ELSE 'customer' END AS node_type,
           r AS rank_q
         FROM it$Iters"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x34_pagerank" -> x34PageRank)

  val oracle: Map[String, String] = Map(
    "x34_pagerank" -> oracleSqlText)
}

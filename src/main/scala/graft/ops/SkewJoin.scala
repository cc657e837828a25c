package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Salted equi-join for skewed keys (SURVEY §4 / the 100 TB design
  * note: "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is
  * the tool when one key dominates so heavily that even split shuffle
  * blocks hotspot a single task, or when AQE is unavailable
  * (streaming joins). Mechanics: the large side gets a deterministic
  * per-row salt in [0, salts); the small side is replicated once per
  * salt; the join key becomes (key, salt), spreading each hot key
  * over `salts` tasks. Row-content hashing keeps the salt
  * deterministic run-to-run (no rand()).
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // Replicating the small side is only sound when unmatched SMALL
    // rows never reach the output: under right/full outer each
    // unmatched small row would surface once per salt replica.
    val normalized = joinType.toLowerCase.replaceAll("[_ ]", "")
    // "semi"/"anti" are Spark's bare aliases for left_semi/left_anti —
    // equally replication-safe (only large-side rows can surface).
    require(Set("inner", "left", "leftouter",
        "leftsemi", "semi", "leftanti", "anti").contains(normalized),
      s"saltedJoin supports inner/left_outer/left_semi/left_anti, " +
        s"got '$joinType' (small-side replication breaks right/full outer)")
    val saltCol: Column =
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(salts))
    val salted = large.withColumn("__salt", saltCol)
    val expanded = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(expanded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** J8 — the gated skew demo: a fact side where ONE key carries 90%
    * of the rows (the adversarial shape that hotspots a single task in
    * a plain shuffle join — at 100 TB that task gets ~90 TB), joined
    * to a 97-row dim through [[saltedJoin]]. The hot key's rows spread
    * over `salts` tasks; per-task input drops from 0.9·n to 0.9·n/8.
    * The oracle runs the PLAIN join — row-identical results are the
    * point (salting is a physical rewrite, not a semantic one). AQE's
    * skew-join handles the sort-merge case at runtime; explicit
    * salting is the deterministic tool for streaming joins and for
    * broadcast-ineligible dims. */
  def j8SkewedSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.orders(s, dir).select(
      when(col("o_orderkey") % 10 < 9, 0L)
        .otherwise(pmod(col("o_orderkey"), lit(97L))).as("k"),
      col("o_totalprice"))
    val dim = s.range(0, 97).select(col("id").as("k"),
      concat(lit("seg_"), col("id")).as("seg_name"))
    saltedJoin(fact, dim, "k", salts = 8)
      .groupBy("seg_name")
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum2(col("o_totalprice")).as("sum_total"))
  }

  /** J9 — the SAME 90%-hot-key join, handled by Spark's own AQE
    * skew-join instead of manual salting: a plain sort-merge join
    * whose skewed shuffle blocks AQE splits AT RUNTIME using the real
    * map-output sizes (`OptimizeSkewedJoin` — the reader side of the
    * hot partition fans out into multiple tasks, visible as
    * `skew=true` on the join node in the final adaptive plan, which
    * OperatorSpec asserts). The oracle is the identical plain join —
    * like salting, skew-split is a physical rewrite only.
    *
    * Which tool when (the 100 TB decision rule): AQE FIRST — zero
    * code, driven by measured sizes, and it handles the common case
    * of several moderately hot keys; it is what a real cluster
    * relies on by default. Manual salting (j8) remains for the cases
    * AQE can't reach: streaming joins (no AQE), and a single
    * pathologically hot KEY — AQE splits a skewed PARTITION, but all
    * of one key's matches still meet in the join, whereas the salt
    * spreads one key's rows over `salts` independent tasks.
    *
    * Runs in an ISOLATED session (`newSession` — same SparkContext
    * and catalog, separate SQLConf): the skew thresholds are tuned
    * down so the demo triggers at test scale (the defaults are
    * 256 MB — real 100 TB settings), and the dim broadcast is
    * disabled so a shuffle exists to split; isolation keeps those
    * knobs out of the shared session every other query runs under. */
  def j9SkewedAqeJoin(s: SparkSession, dir: String): DataFrame = {
    val sess = s.newSession()
    sess.conf.set("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    sess.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    sess.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
    sess.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    // no coalescing floor that would re-merge the split reader
    sess.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1k")
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sess.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // AQE splits a skewed reduce partition at MAP-OUTPUT boundaries
    // (ShufflePartitionsUtil.createSkewPartitionSpecs) — at 100 TB a
    // scan has thousands of map tasks, but this test file reads as
    // ONE, leaving the hot partition a single indivisible chunk. The
    // repartition exists purely to give the demo the map-side fan-in
    // a real cluster has; it is NOT part of the production recipe.
    val fact = Tables.orders(sess, dir).repartition(16).select(
      when(col("o_orderkey") % 10 < 9, 0L)
        .otherwise(pmod(col("o_orderkey"), lit(97L))).as("k"),
      col("o_totalprice"))
    val dim = sess.range(0, 97).select(col("id").as("k"),
      concat(lit("seg_"), col("id")).as("seg_name"))
    fact.join(dim, "k")
      .groupBy("seg_name")
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum2(col("o_totalprice")).as("sum_total"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j8_skew_salted_join" -> j8SkewedSaltedJoin,
    "j9_skew_aqe_join" -> j9SkewedAqeJoin)

  val oracle: Map[String, String] = Map(
    "j8_skew_salted_join" ->
      s"""WITH f AS (SELECT CASE WHEN o_orderkey % 10 < 9 THEN 0
                            ELSE o_orderkey % 97 END AS k,
                     o_totalprice FROM orders),
         d AS (SELECT range AS k, 'seg_' || range AS seg_name
               FROM range(0, 97))
         SELECT seg_name, count(*) AS n_orders,
           ${Det.sqlDsum2("o_totalprice")} AS sum_total
         FROM f JOIN d USING (k)
         GROUP BY 1""",
    // identical SQL on purpose: AQE skew-split (like salting) is a
    // physical rewrite — the gate proves values are untouched by it
    "j9_skew_aqe_join" ->
      s"""WITH f AS (SELECT CASE WHEN o_orderkey % 10 < 9 THEN 0
                            ELSE o_orderkey % 97 END AS k,
                     o_totalprice FROM orders),
         d AS (SELECT range AS k, 'seg_' || range AS seg_name
               FROM range(0, 97))
         SELECT seg_name, count(*) AS n_orders,
           ${Det.sqlDsum2("o_totalprice")} AS sum_total
         FROM f JOIN d USING (k)
         GROUP BY 1""")
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal joins over the `events` table — the two time-series join
  * shapes Spark has no built-in operator for (extension layer next to
  * EventStreams; the reference itself has no time-series joins).
  * Both are expressed as compositions of shuffle-friendly built-ins
  * rather than custom physical operators: the plans they produce are
  * exactly the ones a hand-written SparkPlan would want (one hash
  * shuffle on the join key, no per-row range scans, no cross joins).
  */
object TemporalJoins {

  /** J5 — as-of join: for each 'click' event, the most recent
    * 'purchase' by the same user at or before the click (LEFT
    * semantics: clicks with no prior purchase keep NULLs).
    *
    * Implementation is the union+window as-of: tag purchases side=0
    * and clicks side=1, sort each user's merged timeline by
    * (t, side, event_id), and carry the last non-null purchase struct
    * forward with `last(ignoreNulls)`. Side 0 sorting before side 1
    * at equal t gives the `>=` (inclusive) as-of bound. ONE shuffle
    * on user_id, no range join, no broadcast — at 100 TB this is a
    * single sort-merge pass, the same shape kdb/Flink use for as-of.
    * (user_id, ts) purchase ties would make the winner
    * order-dependent; event_id is the deterministic tiebreak. */
  def j5AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"),
      col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("event_type"), col("value"))
    val pType = "struct<purchase_event_id:bigint," +
      "purchase_ts_us:bigint,purchase_value:double>"
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("t"),
        lit(0).as("side"), col("event_id"),
        struct(col("event_id").as("purchase_event_id"),
          col("ts_us").as("purchase_ts_us"),
          col("value").as("purchase_value")).as("p"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("t"), lit(1).as("side"),
        col("event_id"), lit(null).cast(pType).as("p"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("lastp", last("p", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("t").as("ts_us"),
        col("lastp.purchase_event_id").as("purchase_event_id"),
        col("lastp.purchase_ts_us").as("purchase_ts_us"),
        col("lastp.purchase_value").as("purchase_value"))
  }

  private val RangeUs = 600000000L // 10-minute trailing window

  /** J6 — banded range join: per 'error' event, the count of 'click'
    * events by the same user in the trailing 10 minutes
    * (c_ts ∈ (ts−10 min, ts]).
    *
    * A naive interval join is an inequality join — O(per-user cross)
    * and not hash-partitionable. Banding fixes it: both sides bucket
    * time into windows the width of the range, each probe explodes to
    * its 2 candidate buckets (band width = range width ⇒ every match
    * is in the probe's own or previous bucket), and the join becomes
    * an EQUI-join on (user, bucket) + a residual range filter. At
    * 100 TB: one hash shuffle, 2× probe-side replication, no skewed
    * inequality scan. */
  def j6RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"),
      col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("event_type"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"))
      .withColumn("c_bucket", expr(s"c_ts div ${RangeUs}L"))
    val probes = errors
      .withColumn("b0", expr(s"ts_us div ${RangeUs}L"))
      .withColumn("bucket", explode(array(col("b0") - 1, col("b0"))))
    probes.join(clicks,
        col("user_id") === col("c_user") &&
          col("bucket") === col("c_bucket") &&
          col("c_ts") > col("ts_us") - RangeUs &&
          col("c_ts") <= col("ts_us"),
        "left")
      .groupBy("event_id", "user_id", "ts_us")
      .agg(count(col("c_ts")).as("n_clicks_10m"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j5_asof_join" -> j5AsofJoin,
    "j6_range_join" -> j6RangeJoin)

  /** DuckDB mirrors — j5 against DuckDB's native ASOF JOIN (the
    * union+window plan must agree with a first-party as-of engine),
    * j6 against the plain inequality join the banding replaces. */
  val oracle: Map[String, String] = Map(
    "j5_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
             FROM events WHERE event_type = 'click'),
           p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
             FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts_us,
           p.event_id AS purchase_event_id,
           p.ts_us AS purchase_ts_us,
           p.value AS purchase_value
         FROM c ASOF LEFT JOIN p
           ON c.user_id = p.user_id AND c.ts_us >= p.ts_us""",
    "j6_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
             FROM events WHERE event_type = 'error'),
           c AS (SELECT user_id, epoch_us(ts) AS ts_us
             FROM events WHERE event_type = 'click')
         SELECT e.event_id, e.user_id, e.ts_us,
           count(c.ts_us) AS n_clicks_10m
         FROM e LEFT JOIN c ON e.user_id = c.user_id
           AND c.ts_us > e.ts_us - 600000000
           AND c.ts_us <= e.ts_us
         GROUP BY 1, 2, 3""")
}

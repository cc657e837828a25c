package graft

import org.apache.spark.sql.functions._
import graft.ops.TemporalJoins

/** Semantics + plan-shape gates for the temporal joins. Each is
  * checked against a NAIVE inequality-join reference on the small
  * fixture (the formulation the scalable plan replaces), and the
  * physical plan is asserted free of the operators banding/as-of
  * exist to avoid (cartesian/broadcast-nested-loop). */
class TemporalJoinsSpec extends SparkTestBase {

  test("j5 as-of: matches naive greatest-prior-purchase join") {
    val out = TemporalJoins.j5AsofJoin(spark, sfSmoke)
    val ev = Tables.events(spark, sfSmoke).select(col("event_id"),
      col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    // naive: inequality join + max(prior purchase ts) per click
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_us").as("p_ts"))
    val naive = clicks.join(purchases,
        col("user_id") === col("p_user") && col("p_ts") <= col("ts_us"),
        "left")
      .groupBy("event_id").agg(max("p_ts").as("want_ts"))
    val joined = out.join(naive, "event_id")
    assert(joined.count() == clicks.count())
    assert(joined.filter(
      !(col("purchase_ts_us") <=> col("want_ts"))).count() == 0)
    // as-of bound: matched purchase never after the click
    assert(out.filter(col("purchase_ts_us") > col("ts_us")).count() == 0)
  }

  test("j5 plan: no join operator at all — one windowed union pass") {
    val plan = TemporalJoins.j5AsofJoin(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
    assert(plan.contains("Window"))
  }

  test("j6 banded range join: matches naive inequality join") {
    val out = TemporalJoins.j6RangeJoin(spark, sfSmoke)
    val ev = Tables.events(spark, sfSmoke).select(col("event_id"),
      col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("event_type"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"))
    val naive = errors.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") > col("ts_us") - 600000000L &&
          col("c_ts") <= col("ts_us"), "left")
      .groupBy("event_id").agg(count(col("c_ts")).as("want_n"))
    val joined = out.join(naive, "event_id")
    assert(joined.count() == errors.count())
    assert(joined.filter(col("n_clicks_10m") =!= col("want_n"))
      .count() == 0)
    // sanity: some error actually has trailing clicks
    assert(out.agg(sum("n_clicks_10m")).head().getLong(0) > 0)
  }

  test("j6 plan: equi-join on (user, bucket) — no nested-loop join") {
    val plan = TemporalJoins.j6RangeJoin(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

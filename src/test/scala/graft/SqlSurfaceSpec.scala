package graft

import graft.ops.{Aggregates, SqlSurface}

class SqlSurfaceSpec extends SparkTestBase {

  test("correlated EXISTS decorrelates to a left-semi join") {
    val df = SqlSurface.q2SqlExists(spark, sfSmoke)
    val plan = df.queryExecution.optimizedPlan.toString
    // RewritePredicateSubquery must have replaced the per-row
    // subquery with one semi join — at scale an un-decorrelated
    // EXISTS re-scans lineitem once per order
    assert(plan.contains("LeftSemi"), s"expected LeftSemi join:\n$plan")
    assert(!plan.contains("exists#"),
      s"EXISTS predicate survived optimization:\n$plan")
    assert(df.count() > 0)
  }

  test("correlated scalar subquery decorrelates to an aggregate join") {
    val df = SqlSurface.q3SqlScalarSub(spark, sfSmoke)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), s"expected a join:\n$plan")
    assert(!plan.contains("scalar-subquery"),
      s"scalar subquery survived optimization:\n$plan")
    assert(df.count() == 1)
  }

  test("snowflake join broadcasts every dim; only the fact join shuffles") {
    val df = SqlSurface.q5SqlSnowflake(spark, sfSmoke)
    val plan = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3,
      s"supplier/nation/region should broadcast, got $broadcasts:\n$plan")
    assert(df.count() > 0)
  }

  test("LATERAL derived table decorrelates to one aggregate + join") {
    val df = SqlSurface.q7SqlLateral(spark, sfSmoke)
    val plan = df.queryExecution.optimizedPlan.toString
    // DecorrelateInnerQuery must rewrite the per-row lateral into a
    // single grouped aggregate over orders joined on the correlation
    // key — at scale the naive plan re-scans orders once per customer
    assert(plan.contains("Join"), s"expected a join:\n$plan")
    assert(!plan.toLowerCase.contains("lateral"),
      s"lateral survived optimization:\n$plan")
    // orders is aggregated ONCE, grouped by the correlation key (the
    // second Aggregate in the rewrite is the tiny outer-key domain)
    assert(plan.contains("Aggregate [o_custkey"),
      s"expected one grouped aggregate over orders:\n$plan")
    // aggregate lateral is 1:1 — row count is outer-driven
    val outer = Tables.customer(spark, sfSmoke)
      .filter("c_custkey <= 100").count()
    assert(df.count() == outer)
  }

  test("w3 evaluates a RANGE frame with one keyed sort") {
    val df = Aggregates.w3RangeWindow(spark, sfSmoke)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeFrame") ||
      plan.toUpperCase.contains("RANGE BETWEEN"),
      s"expected a RANGE window frame:\n$plan")
    // exactly one Window operator, partitioned (no global-sort warning)
    assert("Window".r.findAllIn(plan).size >= 1)
    assert(df.count() == Tables.orders(spark, sfSmoke).count())
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The SQL front-end surface: queries expressed as `spark.sql(...)`
  * over the registered temp-view catalog (SURVEY §1.1 — catalog =
  * name→view). The ONE SQL text serves both engines: it is returned
  * verbatim as the DuckDB oracle, so parity is by construction
  * (the text only uses the dialect intersection: ANSI joins,
  * GROUP BY ordinals, Det's floor-arithmetic rounding).
  */
object SqlSurface {

  /** Star-join revenue rollup — lineitem ⋈ orders ⋈ customer, revenue
    * by (priority, segment). Catalyst gets the same free rein as the
    * DataFrame path: pushdown, partial aggs, join reordering.
    *
    * Revenue accumulates in DECIMAL, not double: TPC-H prices are
    * exact in cents, so `decimal(12,2) * (1 - decimal(12,2))` is an
    * exact scale-4 decimal and its sum is associative — the result
    * cannot depend on either engine's accumulation order. (The
    * round-1 double-sum version crossed a rounding boundary for one
    * of the 25 groups.) */
  val starJoinSql: String =
    s"""SELECT o_orderpriority, c_mktsegment,
       cast(sum(cast(l_extendedprice AS decimal(12,2))
                * (1 - cast(l_discount AS decimal(12,2)))) AS double)
         AS revenue,
       count(*) AS n_lines
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       GROUP BY 1, 2"""

  def q1SqlStarJoin(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(starJoinSql)
  }

  /** Correlated EXISTS (TPC-H Q4 shape) — Catalyst must DECORRELATE:
    * the subquery cannot execute per outer row at any scale, so the
    * optimizer rewrites it to one left-semi hash join on l_orderkey
    * (RewritePredicateSubquery; visible as LeftSemi in the plan, and
    * gated by SqlSurfaceSpec). DuckDB performs the same flattening —
    * one SQL text, two engines, both planning the join form. */
  val existsSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_quantity > 45)
       GROUP BY 1"""

  def q2SqlExists(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(existsSql)
  }

  /** Correlated SCALAR subquery (TPC-H Q17 shape): each lineitem
    * compares against a per-part aggregate — decorrelated into an
    * aggregate-then-join on l_partkey, NOT a per-row re-scan.
    * Determinism note: l_quantity is integral, so the per-part
    * double avg is an exact sum / exact count — associative in both
    * engines; the 1.3× threshold is then one identical IEEE multiply.
    * The price sum accumulates in decimal per Det's rule. */
  val scalarSubSql: String =
    """SELECT cast(count(*) AS bigint) AS n_heavy,
       cast(sum(cast(l_extendedprice AS decimal(12,2))) AS double)
         AS price_sum
       FROM lineitem l1
       WHERE l_quantity > (SELECT 1.3 * avg(l_quantity)
                           FROM lineitem l2
                           WHERE l2.l_partkey = l1.l_partkey)"""

  def q3SqlScalarSub(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(scalarSubSql)
  }

  /** Explicit GROUPING SETS with grouping() markers — the general
    * lattice form whose fixed shapes are g14 (rollup) and g15
    * (cube). Same execution: ONE Expand over the input (4 replicas
    * here), one hash aggregate, one exchange — never a union of
    * per-set scans. grouping() disambiguates a NULL group value from
    * a super-aggregate row, which matters on nullable keys. */
  val groupingSetsSql: String =
    """SELECT o_orderpriority, o_orderstatus,
       cast(grouping(o_orderpriority) AS int) AS g_pri,
       cast(grouping(o_orderstatus) AS int) AS g_st,
       count(*) AS n,
       cast(sum(cast(o_totalprice AS decimal(12,2))) AS double) AS total
       FROM orders
       GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
         (o_orderpriority), (o_orderstatus), ())"""

  def q4SqlGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(groupingSetsSql)
  }

  /** Five-table snowflake join (TPC-H Q5 shape): one selective fact
    * filter, a fact⋈fact join, then a broadcastable dim chain
    * supplier→nation→region. The planner test here is JOIN ORDERING
    * and build-side choice — at this shape Catalyst/AQE should
    * broadcast every dim and leave one shuffled join (lineitem ⋈
    * orders); revenue accumulates in decimal per Det's rule. */
  val snowflakeSql: String =
    """SELECT r_name, n_name,
       cast(sum(cast(l_extendedprice AS decimal(12,2))
                * (1 - cast(l_discount AS decimal(12,2)))) AS double)
         AS revenue,
       count(*) AS n_lines
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE o_orderpriority = '1-URGENT'
       GROUP BY 1, 2"""

  def q5SqlSnowflake(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(snowflakeSql)
  }

  /** Recursive CTE (WITH RECURSIVE, SQL:1999) — a dense month spine
    * generated by recursion from the fact table's own date bounds,
    * LEFT-JOINed back so months with no qualifying orders surface as
    * explicit zero rows (gap-filling sparse facts into a dense time
    * series — the reporting shape a bare GROUP BY can't produce,
    * because absent groups don't exist to group on). The selective
    * filter guarantees at least one empty month at test SF, so the
    * coalesce path is genuinely exercised.
    *
    * Scale note: recursion depth = calendar span in MONTHS (80 here,
    * identical at every SF), not data volume — the spine is O(1)
    * work at any corpus size while the fact side underneath stays
    * one distributed hash agg + pushed-down scan filter. Spark 4
    * executes the recursion as a UnionLoop; the default
    * cteRecursionLevelLimit (100) covers the span with room (a
    * longer calendar would raise the conf, not the plan shape).
    * Both engines run the SAME text (the SqlSurface contract), so
    * the recursion semantics — anchor once, step until the bound —
    * are pinned cross-engine.
    *
    * The stop bound rides ALONG the recursion as a second column
    * computed once in the anchor: phrased as a scalar subquery in
    * the step's WHERE, Spark re-instantiates (and re-runs) the
    * orders aggregate on EVERY iteration — 80 full fact scans for
    * one constant, measured at 11.6 s of the 76 s bench before the
    * rewrite vs ~0.5 s after. Carried-state-instead-of-re-derivation
    * is the general recursion discipline; the month counter is the
    * same idea for the value being advanced. */
  val recursiveSql: String =
    """WITH RECURSIVE months(m, hi) AS (
         SELECT date_trunc('month', min(o_orderdate)),
                date_trunc('month', max(o_orderdate))
         FROM orders
         UNION ALL
         SELECT m + INTERVAL 1 MONTH, hi FROM months
         WHERE m < hi
       )
       SELECT m AS month,
              cast(coalesce(f.n_orders, 0) AS bigint) AS n_orders,
              coalesce(f.revenue, cast(0 AS double)) AS revenue
       FROM months
       LEFT JOIN (
         SELECT date_trunc('month', o_orderdate) AS fm,
                count(*) AS n_orders,
                cast(sum(cast(o_totalprice AS decimal(12,2))) AS double)
                  AS revenue
         FROM orders
         WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000
         GROUP BY 1
       ) f ON m = fm"""

  def q6SqlRecursive(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(recursiveSql)
  }

  /** LATERAL correlated derived table (SQL:1999) — a per-customer
    * multi-column summary computed by a subquery that references the
    * outer row, the "for each row, run this query" surface. A naive
    * engine executes the inner query once per outer row (O(n) scans
    * of orders); Catalyst decorrelates it into ONE aggregate over
    * orders joined back on the correlation key — the same
    * rewrite-to-join discipline q2/q3 pin for EXISTS and scalar
    * subqueries, extended to whole derived tables. The aggregate
    * lateral always yields exactly one row (NULL max / 0 count for
    * customers with no qualifying orders), so the join is 1:1 and
    * row counts are outer-driven. Same text in both engines; max()
    * selects an existing parquet value (no float arithmetic), so the
    * result hash-gates without Det rounding. */
  val lateralSql: String =
    """SELECT c.c_custkey, c.c_mktsegment, t.max_price, t.n_orders
       FROM customer c, LATERAL (
         SELECT max(o_totalprice) AS max_price,
                count(*) AS n_orders
         FROM orders WHERE o_custkey = c.c_custkey
       ) t
       WHERE c.c_custkey <= 100"""

  def q7SqlLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(lateralSql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_sql_star_join" -> q1SqlStarJoin,
    "q5_sql_snowflake" -> q5SqlSnowflake,
    "q2_sql_exists" -> q2SqlExists,
    "q3_sql_scalar_subquery" -> q3SqlScalarSub,
    "q4_sql_grouping_sets" -> q4SqlGroupingSets,
    "q6_sql_recursive" -> q6SqlRecursive,
    "q7_sql_lateral" -> q7SqlLateral)

  val oracle: Map[String, String] = Map(
    "q1_sql_star_join" -> starJoinSql,
    "q5_sql_snowflake" -> snowflakeSql,
    "q2_sql_exists" -> existsSql,
    "q3_sql_scalar_subquery" -> scalarSubSql,
    "q4_sql_grouping_sets" -> groupingSetsSql,
    "q6_sql_recursive" -> recursiveSql,
    "q7_sql_lateral" -> lateralSql)
}

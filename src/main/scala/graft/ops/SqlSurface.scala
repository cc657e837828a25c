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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_sql_star_join" -> q1SqlStarJoin)

  val oracle: Map[String, String] = Map(
    "q1_sql_star_join" -> starJoinSql)
}

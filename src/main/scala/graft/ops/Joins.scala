package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Join and set operators (SURVEY.md §2.3, §2.6).
  *
  * Strategy notes for 100 TB (SURVEY §4): dimension joins (nation,
  * region, supplier) are explicitly `broadcast()` — no shuffle of the
  * fact side. The fact⋈fact join (lineitem⋈orders) is left to Catalyst:
  * at bench scale AQE may still broadcast; at cluster scale it becomes
  * a sort-merge join on the shared key, which is the right plan. Both
  * sides shuffle once on the join key and nothing else.
  */
object Joins {

  /** J1 — fact⋈fact equi-join on the shared key (R:272, R:315: attach
    * derived features on 단지코드). Revenue by order priority. */
  def j1JoinFacts(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        (Det.d2(col("l_extendedprice"))
          * (lit(1) - Det.d2(col("l_discount")))).as("revenue"))
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("revenue").cast("double").as("total_revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** J2 — broadcast dimension join chain (R:1043–1044: 16-row
    * age_gender enrichment ≈ nation/region dims). */
  def j2JoinDims(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_customers"),
        Det.r2(Det.dsum2(col("c_acctbal")) / count(lit(1)))
          .as("avg_acctbal"))

  /** J3 — anti-join (R:970, R:979: `setdiff` / `!code %in%` as a
    * filter). Customers that never placed a large order. At scale this
    * is a shuffled left-anti hash join — never a collected isin list;
    * the totalprice filter pushes below the join to shrink the build
    * side first. */
  def j3AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 250000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** J4 — "bind_cols done right" (R:576–577, R:1219–1231): the
    * reference zips tables positionally; at scale the only safe
    * equivalent is to keep the key and equi-join the two derived
    * tables (SURVEY §2.3 J4). */
  def j4ZipJoin(s: SparkSession, dir: String): DataFrame = {
    val ordersPerCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum2(col("o_totalprice")).as("total_spent"))
    val balance = Tables.customer(s, dir)
      .select(col("c_custkey").as("custkey"), col("c_acctbal"))
    balance.join(ordersPerCust, Seq("custkey"), "inner")
  }

  /** T1 — union / row-bind (R:451–463: 16-way `rbind(subset…)`;
    * R:988–989). Two tagged cohorts unioned by name. The same result
    * is expressible as one isin-filter (F2) — both semantics kept. */
  def t1Union(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val a = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_mktsegment"),
        lit("cohort_a").as("cohort"))
    val b = c.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"), col("c_mktsegment"),
        lit("cohort_b").as("cohort"))
    a.unionByName(b)
  }

  /** T2 — set difference on data (R:970: `setdiff(codes, trainCodes)`). */
  def t2Except(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.customer(s, dir).select(col("c_custkey").as("custkey"))
    val bigSpenders = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey")).distinct()
    all.except(bigSpenders)
  }

  /** T3 — set intersection (R:159, R:1186). */
  def t3Intersect(s: SparkSession, dir: String): DataFrame = {
    val ordered = Tables.orders(s, dir)
      .select(col("o_custkey").as("custkey")).distinct()
    val positive = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 0)
      .select(col("c_custkey").as("custkey"))
    ordered.intersect(positive)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j1_join_facts" -> j1JoinFacts,
    "j2_join_dims" -> j2JoinDims,
    "j3_anti_join" -> j3AntiJoin,
    "j4_zip_join" -> j4ZipJoin,
    "t1_union" -> t1Union,
    "t2_except" -> t2Except,
    "t3_intersect" -> t3Intersect)

  val oracle: Map[String, String] = Map(
    "j1_join_facts" ->
      s"""SELECT o_orderpriority,
         cast(sum(${Det.sqlD2("l_extendedprice")}
                  * (1 - ${Det.sqlD2("l_discount")})) AS double)
           AS total_revenue,
         count(*) AS n_lines
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1""",
    "j2_join_dims" ->
      s"""SELECT r_name, count(*) AS n_customers,
         ${Det.sql(s"${Det.sqlDsum2("c_acctbal")} / count(*)", 2)}
           AS avg_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1""",
    "j3_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS
           (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_totalprice > 250000)""",
    "j4_zip_join" ->
      s"""SELECT c_custkey AS custkey, c_acctbal,
         count(*) AS n_orders,
         ${Det.sqlDsum2("o_totalprice")} AS total_spent
         FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY 1, 2""",
    "t1_union" ->
      """SELECT c_custkey, c_mktsegment, 'cohort_a' AS cohort
         FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION ALL
         SELECT c_custkey, c_mktsegment, 'cohort_b'
         FROM customer WHERE c_mktsegment = 'AUTOMOBILE'""",
    "t2_except" ->
      """SELECT c_custkey AS custkey FROM customer
         EXCEPT
         SELECT DISTINCT o_custkey FROM orders
         WHERE o_totalprice > 400000""",
    "t3_intersect" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
         INTERSECT
         SELECT c_custkey FROM customer WHERE c_acctbal > 0""")
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sorting / limiting / sampling operators (SURVEY.md §2.7).
  *
  * The reference has no window functions; exact stratified sampling
  * (O3) deliberately introduces `Window.partitionBy` as an
  * implementation detail because the R seed-based `slice_sample`
  * (R:962–992) is not reproducible cross-engine. Determinism rule
  * (SURVEY §7.1): derive every sample from the KEY, never from RNG.
  *
  * Scale: a global orderBy is a range-partitioned shuffle — fine for
  * top-k output; the stratified sample's window shuffles once on the
  * stratum key, identical cost to a groupBy.
  */
object Ordering {

  /** O1 — order by + rank (R:238 `arrange(Freq)`, R:531 `arrange(-VIF)`).
    * Ranks priorities by total revenue; the rank column pins the sort
    * order into the data so the oracle compare sees it. */
  def o1OrderBy(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(Det.dsum2(col("o_totalprice")).as("total_price"))
    agg.withColumn("rank",
      row_number().over(Window.orderBy(col("total_price").desc,
        col("o_orderpriority"))))
  }

  /** O2 — head / limit (R:142–143 `head`): deterministic top-10 via
    * total order with unique tiebreak. Spark plans TakeOrderedAndProject
    * — no full sort materialization. */
  def o2Limit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(10)

  /** O3 — exact stratified 80% sample without replacement (R:962–992:
    * `group_by(지역) %>% slice_sample(prop=0.8)` with seeds). Exact,
    * deterministic variant: rank within stratum by key, keep
    * rank <= ceil(0.8 * stratum size). One shuffle on the stratum. */
  def o3StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    val wAll = Window.partitionBy("c_mktsegment")
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_stratum", count(lit(1)).over(wAll))
      .filter(col("rn") <= ceil(col("n_stratum") * 0.8))
      .select("c_custkey", "c_mktsegment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o1_order_by" -> o1OrderBy,
    "o2_limit" -> o2Limit,
    "o3_stratified_sample" -> o3StratifiedSample)

  val oracle: Map[String, String] = Map(
    "o1_order_by" ->
      s"""SELECT o_orderpriority, total_price,
         cast(row_number() OVER (ORDER BY total_price DESC,
           o_orderpriority) AS int) AS rank
         FROM (SELECT o_orderpriority,
                 ${Det.sqlDsum2("o_totalprice")} AS total_price
               FROM orders GROUP BY 1)""",
    "o2_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "o3_stratified_sample" ->
      """SELECT c_custkey, c_mktsegment FROM
         (SELECT c_custkey, c_mktsegment,
            row_number() OVER (PARTITION BY c_mktsegment
              ORDER BY c_custkey) AS rn,
            count(*) OVER (PARTITION BY c_mktsegment) AS n_stratum
          FROM customer)
         WHERE rn <= ceil(n_stratum * 0.8)""")
}

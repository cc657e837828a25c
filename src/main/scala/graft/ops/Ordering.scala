package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sorting / limiting / sampling operators (SURVEY.md §2.7).
  *
  * Determinism rule (SURVEY §7.1): derive every sample from the KEY,
  * never from RNG — the R seed-based `slice_sample` (R:962–992) is
  * not reproducible cross-engine, a key-arithmetic filter is.
  *
  * Scale: a global orderBy is a range-partitioned shuffle — fine for
  * top-k output; the stratified sample is a pure scan-level filter
  * (no shuffle, no per-stratum sort).
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

  /** O3 — deterministic stratified 80% sample without replacement
    * (R:962–992: `group_by(지역) %>% slice_sample(prop=0.8)` with
    * seeds). KEY-DERIVED (SURVEY §7.1): membership is a pure function
    * of the row key — `((k · 2654435761) >> 16) % 10 < 8`. The shift
    * is what makes the Knuth multiplicative mix real: the product's
    * LOW digits are periodic in k (2654435761 ≡ 1 mod 10, so
    * `product % 10 == k % 10` — a fixed keep-pattern over sequential
    * keys), while the HIGH bits scramble; taking `>> 16` before the
    * modulus decorrelates membership from sequential key ranges.
    * Everything stays exact int64 arithmetic (max product ≈ 4e15 ≪
    * 2^63), which makes the sample a plain codegen'd FILTER at the
    * scan: no window, no per-stratum sort, no shuffle at all. The
    * earlier rank-within-stratum form guaranteed exact ceil(0.8·n) per
    * stratum but globally sorted each stratum in ONE task (the ~5
    * distinct strata here would each become a scale-killer straggler
    * at 100×); per-stratum exactness is the price, and with uniform
    * keys each stratum lands within O(1/√n) of 80%. Identical
    * arithmetic runs in both engines → hash-gated. */
  def o3StratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(shiftright(col("c_custkey") * 2654435761L, 16) % 10 < 8)
      .select("c_custkey", "c_mktsegment")

  /** O5 — deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis 2006): keep the k docs with the largest
    * u^(1/w) — equivalently the largest ln(u)/w, the log form so no
    * cross-engine `pow` enters — where u is the o3/x14 key-mix mapped
    * onto (0,1] (reproducible "randomness": same corpus ⇒ same
    * sample) and w = n_chars (longer docs proportionally likelier —
    * in production, a quality score). Priorities quantize to 1e−6
    * integers (the x12 ln discipline) and ties break by doc_id, so
    * selection is total-ordered and engine-independent. Plan shape:
    * scan-level priority projection + global top-k =
    * TakeOrderedAndProject — per-partition bounded heaps, only
    * k·partitions rows reach the driver side of the sort, never a
    * full corpus sort. */
  def o5WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val u = ((shiftright(col("doc_id") * 2654435761L, 16) % 1000000L)
      + 1L) / lit(1000000.0)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").as("w"),
        floor(log(u) / col("n_chars") * 1000000.0).cast("long")
          .as("priority_q"))
      .orderBy(col("priority_q").desc, col("doc_id").asc)
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o1_order_by" -> o1OrderBy,
    "o2_limit" -> o2Limit,
    "o3_stratified_sample" -> o3StratifiedSample,
    "o5_weighted_sample" -> o5WeightedSample)

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
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE ((c_custkey * 2654435761) >> 16) % 10 < 8""",
    "o5_weighted_sample" ->
      """WITH t AS (SELECT doc_id, n_chars AS w,
             ((doc_id * 2654435761 >> 16) % 1000000 + 1) / 1000000.0
               AS u
           FROM documents)
         SELECT doc_id, w,
           cast(floor(ln(u) / w * 1000000.0) AS bigint) AS priority_q
         FROM t ORDER BY priority_q DESC, doc_id LIMIT 100""")
}

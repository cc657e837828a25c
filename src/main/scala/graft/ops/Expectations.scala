package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality expectations with quarantine — the
  * constraint gate a 100 TB ingest runs at every stage boundary (the
  * public Delta `CHECK` constraint / DLT expectation idea as a plain
  * operator): a named predicate set is evaluated in ONE pass, rows
  * failing any predicate are split to a quarantine side carrying the
  * names of the expectations they failed (so triage never re-derives
  * the reason), and a per-expectation violation summary comes from
  * the same conditional aggregation — no per-constraint rescans.
  *
  * NULL discipline: a predicate evaluating to NULL counts as a
  * violation (`coalesce(p, false)`), matching SQL CHECK-constraint
  * pessimism for quality gates — an unknown is not a pass.
  *
  * Scale shape: the summary is one partial+final hash aggregate of
  * booleans (one row per partition crosses the shuffle); the
  * clean/quarantine split is two scan-level filters over the same
  * pushed-down read, each a plain codegen'd projection — the
  * expectation COUNT multiplies per-row arithmetic, never passes or
  * shuffles. The planted fixture corrupts deterministic key slices so
  * every expectation fires at any SF and the oracle can replant
  * identically (the x16 pattern).
  */
object Expectations {

  /** A named row-level constraint. */
  final case class Expectation(name: String, predicate: Column)

  /** NULL-pessimistic pass/fail of one expectation. */
  private def ok(e: Expectation): Column =
    coalesce(e.predicate, lit(false))

  /** All-pass predicate for a set. */
  def passesAll(es: Seq[Expectation]): Column =
    es.map(ok).reduce(_ && _)

  /** Rows passing every expectation. */
  def clean(df: DataFrame, es: Seq[Expectation]): DataFrame =
    df.filter(passesAll(es))

  /** Rows failing at least one expectation, each carrying the array
    * of failed expectation names in `failed_expectations`. */
  def quarantine(df: DataFrame, es: Seq[Expectation]): DataFrame =
    df.filter(!passesAll(es))
      .withColumn("failed_expectations",
        array_compact(array(es.map(e =>
          when(!ok(e), lit(e.name))): _*)))

  /** One-row, one-pass violation summary: total rows, per-expectation
    * failure counts (`n_fail_<name>`), and the quarantined-row count
    * (failing ANY). */
  def summarize(df: DataFrame, es: Seq[Expectation]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      es.map(e => sum(when(!ok(e), 1L).otherwise(0L))
        .as(s"n_fail_${e.name}")) :+
        sum(when(!passesAll(es), 1L).otherwise(0L)).as("n_quarantined"): _*)

  /** The gated fixture's constraint set over lineitem. */
  val lineitemExpectations: Seq[Expectation] = Seq(
    Expectation("quantity_range",
      col("l_quantity") > 0 && col("l_quantity") <= 50),
    Expectation("discount_domain",
      col("l_discount") >= 0 && col("l_discount") <= 0.1),
    Expectation("returnflag_present", col("l_returnflag").isNotNull))

  /** Deterministic corruption so each expectation fires at any SF:
    * disjoint-ish prime key slices get a negated quantity, an
    * out-of-domain discount, and a nulled return flag. */
  private[graft] def planted(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      col("l_orderkey"),
      when(col("l_orderkey") % 97 === 0, -col("l_quantity"))
        .otherwise(col("l_quantity")).as("l_quantity"),
      when(col("l_orderkey") % 101 === 0, lit(0.95))
        .otherwise(col("l_discount")).as("l_discount"),
      when(col("l_orderkey") % 103 === 0, lit(null).cast("string"))
        .otherwise(col("l_returnflag")).as("l_returnflag"))

  /** s16 — the expectation summary over the planted lineitem. */
  def s16Expectations(s: SparkSession, dir: String): DataFrame =
    summarize(planted(s, dir), lineitemExpectations)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s16_expectations" -> s16Expectations)

  val oracle: Map[String, String] = Map(
    "s16_expectations" ->
      """WITH planted AS (
           SELECT l_orderkey,
             CASE WHEN l_orderkey % 97 = 0 THEN -l_quantity
                  ELSE l_quantity END AS l_quantity,
             CASE WHEN l_orderkey % 101 = 0 THEN 0.95
                  ELSE l_discount END AS l_discount,
             CASE WHEN l_orderkey % 103 = 0 THEN NULL
                  ELSE l_returnflag END AS l_returnflag
           FROM lineitem),
         flags AS (
           SELECT
             coalesce(l_quantity > 0 AND l_quantity <= 50, false)
               AS ok_q,
             coalesce(l_discount >= 0 AND l_discount <= 0.1, false)
               AS ok_d,
             coalesce(l_returnflag IS NOT NULL, false) AS ok_r
           FROM planted)
         SELECT cast(count(*) AS bigint) AS n_rows,
           cast(sum(CASE WHEN NOT ok_q THEN 1 ELSE 0 END) AS bigint)
             AS n_fail_quantity_range,
           cast(sum(CASE WHEN NOT ok_d THEN 1 ELSE 0 END) AS bigint)
             AS n_fail_discount_domain,
           cast(sum(CASE WHEN NOT ok_r THEN 1 ELSE 0 END) AS bigint)
             AS n_fail_returnflag_present,
           cast(sum(CASE WHEN NOT (ok_q AND ok_d AND ok_r)
                    THEN 1 ELSE 0 END) AS bigint) AS n_quarantined
         FROM flags""")
}

package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det

/** MICE — Multivariate Imputation by Chained Equations (van Buuren &
  * Groothuis-Oudshoorn 2011), the second commented-out imputation
  * path of the reference (R:820–829; `mice` loaded at R:56–60 but
  * never called; [[KnnImpute]] is the first). The deterministic
  * `norm.predict` variant: no posterior draws — each sweep refits an
  * OLS of every incomplete column on the others (over that column's
  * ORIGINALLY-observed rows, with the other columns at their current
  * imputations) and overwrites the missing cells with predictions,
  * iterated to fixpoint.
  *
  * Spark shape: column count is bounded (single digits), so each
  * regression is ONE moment aggregate over the table — exact-decimal
  * sums collected as a single row, the normal equations solved
  * driver-side (the m2b Cramer arithmetic, in the same written
  * operation order as the SQL oracle), and the imputation applied as
  * a scan-level `when(missing, b0 + Σ bj·xj)` projection. A sweep
  * costs (#incomplete columns) aggregates + projections; nothing is
  * ever row-iterated. The chained state lives in the DataFrame —
  * each sweep's table feeds the next — so the loop is the Rounds
  * pattern at metadata depth (2–3 sweeps; per-sweep localCheckpoint
  * keeps the plan from nesting sweeps inside sweeps).
  *
  * K2 gate: with ONE incomplete column MICE collapses to plain
  * regression imputation — predictions are the closed-form normal-
  * equation fit of the complete rows, fully statable in SQL (the
  * m2b Cramer text over complete-row moments). The same planted
  * missingness as k1 (fixed probe budget), so k1 (mean of k
  * neighbors) and k2 (regression surface) are directly comparable
  * imputation policies over one fixture. The multi-column ITERATIVE
  * form is MlMultimodalSpec-pinned on the parking rents (both rent
  * columns missing together): sweep-over-sweep deltas shrink and
  * the single-target case reproduces the closed form. */
object MiceImpute {

  /** One chained sweep over `targets`: refit + re-impute each in
    * order (the chained part: later targets see earlier targets'
    * fresh imputations). `miss_<c>` boolean columns mark the
    * ORIGINAL missingness throughout. */
  private def sweep(df0: DataFrame, targets: Seq[String],
      others: Seq[String], exact: Boolean): DataFrame = {
    var df = df0
    targets.foreach { c =>
      val preds = (targets.filterNot(_ == c) ++ others).take(2)
      df = imputeColumn(df, c, preds, exact)
    }
    df
  }

  /** Refit y=`target` on exactly two predictors over the originally-
    * observed rows and overwrite the originally-missing cells with
    * b0 + b1·x1 + b2·x2. The solve is the m2b 3×3 Cramer arithmetic
    * on collected moments, written in the oracle's operation order
    * (K2's SQL replays it term for term). With `exact` the moment
    * sums accumulate as decimal(15,2) products cast to double at the
    * end (order-independent — the m2b discipline; sound when every
    * input is integer- or cent-valued, as the K2 fixture is); the
    * plain-double path serves the tolerance-gated chained use. */
  private def imputeColumn(df: DataFrame, target: String,
      preds: Seq[String], exact: Boolean): DataFrame = {
    require(preds.length == 2, "chained equations here are 2-predictor")
    val (p1, p2) = (preds.head, preds(1))
    val d152 = org.apache.spark.sql.types.DecimalType(15, 2)
    def mom(a: Column, b: Column): Column =
      if (exact) sum(a.cast(d152) * b.cast(d152)).cast("double")
      else sum(a * b)
    def mom1(a: Column): Column =
      if (exact) sum(a.cast(d152)).cast("double") else sum(a)
    val obs = df.filter(!col(s"miss_$target"))
    val m = obs.agg(
      count(lit(1)).cast("double").as("s1"),
      mom1(col(p1)).as("sx1"), mom1(col(p2)).as("sx2"),
      mom(col(p1), col(p1)).as("sx11"),
      mom(col(p1), col(p2)).as("sx12"),
      mom(col(p2), col(p2)).as("sx22"),
      mom1(col(target)).as("sy"),
      mom(col(p1), col(target)).as("sx1y"),
      mom(col(p2), col(target)).as("sx2y")).head()
    // Degenerate-fit guards (ADVICE r9): an EMPTY observed set makes
    // every moment aggregate NULL (getDouble on them would NPE) and a
    // COLLINEAR predictor pair makes det = 0, so the Cramer solve
    // would silently write NaN/Inf into the imputed cells of the
    // tolerance-gated chained path. Both are caller errors with no
    // sound closed-form fallback the oracle could replay — fail
    // loudly instead of imputing garbage. s1 is count(*): never null,
    // safe to read before the check.
    val s1 = m.getDouble(0)
    require(s1 > 0.0,
      s"MICE: no observed rows for target '$target' — every value is " +
        "missing, nothing to regress on")
    val (sx1, sx2) = (m.getDouble(1), m.getDouble(2))
    val (sx11, sx12, sx22) = (m.getDouble(3), m.getDouble(4), m.getDouble(5))
    val (sy, sx1y, sx2y) = (m.getDouble(6), m.getDouble(7), m.getDouble(8))
    val det = s1 * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1 * sx22 - sx12 * sx2) +
      sx2 * (sx1 * sx12 - sx11 * sx2)
    require(java.lang.Double.isFinite(det) && math.abs(det) > 0.0,
      s"MICE: singular normal equations for target '$target' " +
        s"(det = $det) — predictors ${preds.mkString(", ")} are " +
        "collinear or constant over the observed rows")
    val b0 = (sy * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1y * sx22 - sx12 * sx2y) +
      sx2 * (sx1y * sx12 - sx11 * sx2y)) / det
    val b1 = (s1 * (sx1y * sx22 - sx12 * sx2y) -
      sy * (sx1 * sx22 - sx12 * sx2) +
      sx2 * (sx1 * sx2y - sx1y * sx2)) / det
    val b2 = (s1 * (sx11 * sx2y - sx1y * sx12) -
      sx1 * (sx1 * sx2y - sx1y * sx2) +
      sy * (sx1 * sx12 - sx11 * sx2)) / det
    df.withColumn(target,
      when(col(s"miss_$target"),
        lit(b0) + lit(b1) * col(p1) + lit(b2) * col(p2))
        .otherwise(col(target)))
  }

  /** The full chained loop: mean-initialize every target's missing
    * cells, then `sweeps` chained passes. Returns the table with
    * targets imputed plus the `miss_*` markers. */
  private[graft] def miceOf(df0: DataFrame, targets: Seq[String],
      others: Seq[String], sweeps: Int,
      exact: Boolean = false): DataFrame = {
    var df = targets.foldLeft(df0) { (d, c) =>
      d.withColumn(s"miss_$c", col(c).isNull)
    }
    // mean init (the mice default start), one tiny aggregate
    val means = df.agg(avg(targets.head).as(targets.head),
      targets.tail.map(c => avg(c).as(c)): _*).head()
    targets.zipWithIndex.foreach { case (c, i) =>
      df = df.withColumn(c, coalesce(col(c), lit(means.getDouble(i))))
    }
    (1 to sweeps).foreach { _ =>
      df = sweep(df, targets, others, exact).localCheckpoint(true)
    }
    df
  }

  /** K2 — the oracle-gated single-target collapse (see object doc):
    * the k1 fixture's planted-missing acctbal, regression-imputed
    * from (order count, spend). One target ⇒ one sweep ⇒ the
    * closed-form complete-row OLS, replayed in SQL. */
  def k2MiceImpute(s: SparkSession, dir: String): DataFrame = {
    val base = KnnImpute.k1Base(s, dir)
      .withColumn("bal", col("bal").cast("double"))
    miceOf(base, Seq("bal"), Seq("f_orders", "f_spend"), sweeps = 1,
      exact = true)
      .filter(col("miss_bal"))
      .select(col("custkey"), Det.r6(col("bal")).as("imputed_acctbal"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k2_mice_impute" -> k2MiceImpute)

  /** The SQL replay: complete-row moments → the identical Cramer
    * solve → b0 + b1·x1 + b2·x2 on the missing rows. The dial CTE is
    * k1's (same planted missingness). */
  val oracle: Map[String, String] = Map(
    "k2_mice_impute" -> {
      val det = """(s1 * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1 * sx22 - sx12 * sx2) +
        sx2 * (sx1 * sx12 - sx11 * sx2))"""
      val b0 = s"""((sy * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1y * sx22 - sx12 * sx2y) +
        sx2 * (sx1y * sx12 - sx11 * sx2y)) / $det)"""
      val b1 = s"""((s1 * (sx1y * sx22 - sx12 * sx2y) -
        sy * (sx1 * sx22 - sx12 * sx2) +
        sx2 * (sx1 * sx2y - sx1y * sx2)) / $det)"""
      val b2 = s"""((s1 * (sx11 * sx2y - sx1y * sx12) -
        sx1 * (sx1 * sx2y - sx1y * sx2) +
        sy * (sx1 * sx12 - sx11 * sx2)) / $det)"""
      s"""WITH percust AS (
           SELECT o_custkey AS custkey,
             cast(count(*) AS double) AS f_orders,
             cast(cast(sum(cast(o_totalprice AS decimal(12,2)))
               AS decimal(14,2)) AS double) AS f_spend
           FROM orders GROUP BY 1),
         dial AS (
           SELECT ${KnnImpute.plantModulusSqlText} AS md
           FROM (SELECT count(*) AS n_cust FROM percust)),
         base AS (
           SELECT c_custkey AS custkey, f_orders, f_spend,
             CASE WHEN c_custkey % (SELECT md FROM dial) = 0 THEN NULL
                  ELSE cast(cast(c_acctbal AS decimal(12,2)) AS double)
             END AS bal
           FROM customer JOIN percust ON c_custkey = custkey),
         m AS (
           SELECT cast(count(*) AS double) AS s1,
             cast(sum(cast(f_orders AS decimal(15,2))) AS double) AS sx1,
             cast(sum(cast(f_spend AS decimal(15,2))) AS double) AS sx2,
             cast(sum(cast(f_orders AS decimal(15,2))
               * cast(f_orders AS decimal(15,2))) AS double) AS sx11,
             cast(sum(cast(f_orders AS decimal(15,2))
               * cast(f_spend AS decimal(15,2))) AS double) AS sx12,
             cast(sum(cast(f_spend AS decimal(15,2))
               * cast(f_spend AS decimal(15,2))) AS double) AS sx22,
             cast(sum(cast(bal AS decimal(15,2))) AS double) AS sy,
             cast(sum(cast(f_orders AS decimal(15,2))
               * cast(bal AS decimal(15,2))) AS double) AS sx1y,
             cast(sum(cast(f_spend AS decimal(15,2))
               * cast(bal AS decimal(15,2))) AS double) AS sx2y
           FROM base WHERE bal IS NOT NULL)
         SELECT custkey,
           ${Det.sql(s"$b0 + $b1 * f_orders + $b2 * f_spend", 6)}
             AS imputed_acctbal
         FROM base, m WHERE bal IS NULL"""
    })
}

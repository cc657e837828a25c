package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Piggyback data-quality counters on an existing pass via
  * `Dataset.observe` (Catalyst's CollectMetrics node): row counts,
  * null counts, and domain violations accumulate DURING whatever
  * action the frame already runs — no second scan, no extra shuffle,
  * exactly the reconciliation counters a 100 TB pipeline wants at
  * every stage boundary ("did the rows into the join equal the rows
  * out of the scan?"). The aggregates must be Spark observable
  * metrics (commutative, deterministic — count/sum/min/max shapes),
  * which is also what makes them free: each task folds locally and
  * the driver merges.
  *
  * Batch: read the merged row from `lastObserved` after an action.
  * Streaming: the same `observe` surfaces per-batch under
  * `StreamingQueryProgress.observedMetrics` — one instrumentation
  * API across both engines' modes.
  */
object Observe {

  val MetricsName = "graft_quality"

  /** Attach row/null/violation counters for `col` to `df` without
    * changing its rows. `domainOk` is an optional predicate whose
    * FALSE rows count as violations (e.g. `col >= 0`). */
  def withQualityCounters(df: DataFrame, column: String,
      domainOk: Option[Column] = None): DataFrame = {
    // coalesce: sum() over zero rows is NULL, and this op's streaming
    // use case sees empty micro-batches routinely — a monitoring
    // consumer must read 0, not NULL, for "no violations in no rows"
    val violations = domainOk match {
      case Some(ok) =>
        coalesce(sum(when(!coalesce(ok, lit(false)), 1).otherwise(0)),
          lit(0L)).as("n_domain_violations")
      case None => lit(0L).as("n_domain_violations")
    }
    df.observe(MetricsName,
      count(lit(1)).as("n_rows"),
      coalesce(sum(when(col(column).isNull, 1).otherwise(0)), lit(0L))
        .as("n_nulls"),
      violations)
  }

  /** The merged metrics row after an action has executed THIS frame's
    * own QueryExecution (`collect`/`foreach`/`write` on `df` itself —
    * `df.count()` builds a separate aggregate QueryExecution and does
    * not populate it). For metrics from arbitrary downstream actions,
    * register a `QueryExecutionListener` and read
    * `qe.observedMetrics` there; streaming reads them per batch from
    * `StreamingQueryProgress.observedMetrics`. Empty before any
    * qualifying action. */
  def lastObserved(df: DataFrame): Option[Row] =
    df.queryExecution.observedMetrics.get(MetricsName)
}

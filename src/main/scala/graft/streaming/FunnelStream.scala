package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.Tables

/** Per-user funnel progress carried across micro-batches: epoch-micros
  * of the earliest view, the earliest click after it, and the earliest
  * purchase after that; -1 = stage not reached. THREE longs per user —
  * the state stays this size forever, however long the stream runs. */
case class FunnelState(t1: Long, t2: Long, t3: Long)

/** Streaming twin of the batch e5 conversion funnel: the strictly
  * ordered view → click → purchase chain advanced incrementally by a
  * `mapGroupsWithState` state machine.
  *
  * Semantics contract: each micro-batch's events are sorted by
  * (event time, event id) before advancing the chain, so the result is
  * EXACT — equal to batch e5 — whenever each user's events arrive in
  * event-time order ACROSS batches (replay of a log, per-key-ordered
  * sources, or the single-batch case). Under cross-batch disorder a
  * late-arriving earlier view could in principle re-qualify a click
  * that was already discarded; the exact general solution buffers
  * events until the watermark (the Sessionize pattern) at
  * O(buffered events) state — this operator deliberately keeps the
  * O(1)-per-user state of a production funnel counter instead.
  * StreamingSpec pins stage-count parity with batch e5 on the full
  * replay. */
object FunnelStream {

  private def advance(st: FunnelState,
      events: Seq[(String, Long)]): FunnelState = {
    var (t1, t2, t3) = (st.t1, st.t2, st.t3)
    events.foreach { case (tpe, us) =>
      if (tpe == "view" && t1 < 0) t1 = us
      else if (tpe == "click" && t2 < 0 && t1 >= 0 && us > t1) t2 = us
      else if (tpe == "purchase" && t3 < 0 && t2 >= 0 && us > t2) t3 = us
    }
    FunnelState(t1, t2, t3)
  }

  /** (user_id, stage) stream — stage = how far the user's chain has
    * progressed (1 view, 2 click, 3 purchase); one UPDATE row per user
    * per batch that changed it. */
  def funnelStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.eventsStream(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, String, Long, Long)],
            state: GroupState[FunnelState]) =>
          val batch = it.toSeq.sortBy(e => (e._3, e._4))
            .map(e => (e._2, e._3))
          val prev = state.getOption.getOrElse(FunnelState(-1, -1, -1))
          val next = advance(prev, batch)
          state.update(next)
          val stage =
            if (next.t3 >= 0) 3 else if (next.t2 >= 0) 2
            else if (next.t1 >= 0) 1 else 0
          (user, stage)
      }
      .toDF("user_id", "stage")
  }
}

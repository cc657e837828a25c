package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** One event as seen by the stateful sessionizer (micros epoch). */
case class SessionEvent(user_id: Long, event_id: Long, ts_us: Long,
    value: Double)

/** The per-user open session kept in state between micro-batches. */
case class OpenSession(start_us: Long, last_us: Long, n_events: Long,
    sum_value: Double)

/** A closed session emitted downstream. */
case class ClosedSession(user_id: Long, session_start_us: Long,
    n_events: Long, duration_us: Long, sum_value: Double)

/** Custom stateful streaming sessionization (SURVEY §2.10 north-star):
  * `KeyValueGroupedDataset.flatMapGroupsWithState` keeping one
  * OpenSession per user; a gap > 30 min closes and emits the session.
  * The batch-parity contract — closed sessions equal the batch e3
  * sessionization minus each user's final (still-open) session — is
  * asserted in StreamingSpec.
  *
  * State size is O(users), the minimum possible for session windows;
  * at cluster scale state lives in the state store, partitioned by
  * user (the groupByKey shuffle).
  */
object Sessionize {

  val GapUs: Long = 30L * 60 * 1000000

  /** Pure merge step: fold a batch of (sorted) events into the open
    * session, emitting every session that closes. Shared by the
    * streaming path and unit tests. */
  def merge(userId: Long, sorted: Seq[SessionEvent],
      open0: Option[OpenSession]): (Seq[ClosedSession], Option[OpenSession]) = {
    var open = open0
    val out = ArrayBuffer.empty[ClosedSession]
    sorted.foreach { e =>
      open = open match {
        case Some(o) if e.ts_us - o.last_us <= GapUs =>
          Some(OpenSession(o.start_us, e.ts_us, o.n_events + 1,
            o.sum_value + e.value))
        case Some(o) =>
          out += ClosedSession(userId, o.start_us, o.n_events,
            o.last_us - o.start_us, o.sum_value)
          Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
        case None =>
          Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
      }
    }
    (out.toSeq, open)
  }

  private def sessionize(userId: Long, events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    val (closed, open) = merge(userId, sorted, state.getOption)
    open.foreach(state.update)
    closed.iterator
  }

  /** The streaming query: file stream → per-user stateful fold. */
  def sessionStream(s: SparkSession, dir: String): Dataset[ClosedSession] = {
    import s.implicits._
    Tables.eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(sessionize)
  }
}

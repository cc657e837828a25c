package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** One event as seen by the stateful sessionizer (micros epoch).
  * `ts` carries the watermarked TimestampType column through the
  * projection — EventTimeTimeout requires the watermark attribute to
  * survive into the stateful operator's input (all session arithmetic
  * still uses the exact ts_us micros). */
case class SessionEvent(user_id: Long, event_id: Long, ts_us: Long,
    value: Double, ts: java.sql.Timestamp = null)

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
  * sessionization minus each user's still-open tail — is asserted in
  * SourcesSessionSpec.
  *
  * State size is O(users) and BOUNDED: sessions close on
  * `EventTimeTimeout` — once the watermark passes a user's last event
  * plus the gap, the open session is emitted and its state evicted,
  * so a user who never returns cannot pin state forever. (With
  * NoTimeout, idle sessions would only close on the user's next
  * event — unbounded state growth at scale.) At cluster scale state
  * lives in the state store, partitioned by user (the groupByKey
  * shuffle).
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
    if (state.hasTimedOut) {
      // Watermark passed last_us + gap with no new events: the session
      // can never be extended (later events would be late-dropped) —
      // emit it and evict the state.
      val out = state.getOption.map(o => ClosedSession(userId, o.start_us,
        o.n_events, o.last_us - o.start_us, o.sum_value))
      state.remove()
      out.iterator
    } else {
      val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val (closed, open) = merge(userId, sorted, state.getOption)
      open.foreach { o =>
        state.update(o)
        // Fire once the event-time watermark passes the inactivity gap.
        // Spark requires the timeout to sit above the current watermark.
        state.setTimeoutTimestamp(math.max((o.last_us + GapUs) / 1000,
          state.getCurrentWatermarkMs + 1))
      }
      closed.iterator
    }
  }

  /** The streaming query: file stream → per-user stateful fold. */
  def sessionStream(s: SparkSession, dir: String): Dataset[ClosedSession] = {
    import s.implicits._
    Tables.eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"), col("ts"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(sessionize)
  }
}

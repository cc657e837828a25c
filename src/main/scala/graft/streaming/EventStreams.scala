package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det

/** Event-time windowing over the `events` table.
  *
  * The reference has no streaming surface (SURVEY §2.10); this is the
  * north-star extension. Each window shape exists twice with ONE
  * shared aggregation body:
  *   - batch mode (`e1`–`e3`): `Tables.events` → `window()`/session
  *     logic → aggregate; DuckDB-oracled below.
  *   - streaming mode (`tumblingStream`/`slidingStream`): readStream
  *     + watermark over the same parquet, ScalaTest-verified to
  *     produce the same rows as batch (batch-parity).
  * Window starts are emitted as epoch MICROS (bigint) — timestamps
  * round-trip differently across engines, epoch integers don't.
  */
object EventStreams {

  // events.value is cents-exact (2-dp doubles) → decimal accumulation
  // (Det.dsum2) makes every sum order-independent: a plain double sum
  // over ~3k groups is one accumulation-reorder away from crossing a
  // rounding boundary (the q1 round-1 failure mode).
  private def tumblingAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum2(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))

  private def slidingAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum2(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** E1 — tumbling 1-hour window per event type. */
  def e1StreamTumbling(s: SparkSession, dir: String): DataFrame =
    tumblingAgg(Tables.events(s, dir))

  /** E2 — sliding 1-hour window, 30-minute slide: each event lands in
    * 2 windows whose starts are slide-aligned. */
  def e2StreamSliding(s: SparkSession, dir: String): DataFrame =
    slidingAgg(Tables.events(s, dir))

  /** E3 — session windows: per user, a 30-minute inactivity gap closes
    * the session. Classic lag+cumulative-sum sessionization — one
    * shuffle on user_id; all arithmetic in epoch micros. */
  def e3StreamSession(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy("ts_us", "event_id")
    val gapUs = 30L * 60 * 1000000
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("new_session",
        when(col("ts_us") - lag("ts_us", 1).over(byUser) > gapUs
          || lag("ts_us", 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max("ts_us") - min("ts_us")).as("duration_us"),
        Det.dsum2(col("value")).as("sum_value"))
  }

  /** E3B — the same sessionization through Spark's BUILT-IN
    * `session_window` (batch mode): windows [ts, ts+gap) merge while
    * they overlap, so a successor at EXACTLY gap distance starts a
    * new session (half-open semantics; e3's lag form uses strict `>`
    * — the two agree unless an event lands on the boundary to the
    * microsecond, and the oracle mirrors the built-in's `>=` split).
    * Same scale shape as e3 — one shuffle on user_id — but the merge
    * runs inside the aggregation operator with no window-function
    * pass, and the IDENTICAL expression works under `readStream` with
    * a watermark (the documented production path; e3's
    * mapGroupsWithState twin exists for custom eviction logic). */
  def e3bSessionWindowBatch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum2(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))

  /** The streaming form of [[e3bSessionWindowBatch]] — literally the
    * same groupBy(session_window) expression under `readStream` plus
    * a watermark. Append mode emits a session once the watermark
    * passes its end (last event + gap); the 1-minute delay bounds
    * state: at any instant only sessions within gap+delay of the
    * watermark are open. StreamingSpec proves emitted sessions are
    * byte-identical to the batch rows, with only open tails held
    * back. */
  def sessionWindowStream(s: SparkSession, dir: String): DataFrame =
    Tables.eventsStream(s, dir)
      .withWatermark("ts", "1 minute")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum2(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))

  /** E5 — conversion funnel (the product-analytics staple): per user,
    * the earliest strictly-ordered view → click → purchase chain —
    * t₁ = first view, t₂ = first click AFTER t₁, t₃ = first purchase
    * AFTER t₂ — reported as per-stage user counts (the funnel chart
    * feed). Sequential-pattern semantics need the chain, not three
    * independent mins: a click before any view must not count.
    * Shape: three hash aggs + two joins, ALL keyed on user_id — one
    * partitioning reused end-to-end, no sort, no window over the raw
    * events; per-stage state is one timestamp per user. Integer
    * epoch-micros comparisons for cross-engine parity. */
  def e5Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("us") > col("t1"))
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("us") > col("t2"))
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    v.agg(count(lit(1)).as("n_users")).select(lit("view").as("stage"),
        col("n_users"))
      .union(c.agg(count(lit(1)).as("n_users"))
        .select(lit("click").as("stage"), col("n_users")))
      .union(p.agg(count(lit(1)).as("n_users"))
        .select(lit("purchase").as("stage"), col("n_users")))
  }

  /** E4 — the BATCH form of [[intervalJoinStream]]'s event-time
    * interval join, oracle-gated: each 'error' pairs with the same
    * user's 'click's from the preceding 10 minutes (blame-window
    * attribution). One equi-join on user_id with the time band as a
    * residual predicate — the shuffle is keyed, never a cross join;
    * the band only bounds the per-user pair fan-out. Epoch-micros
    * output for cross-engine parity (see header). The streaming twin
    * below runs the IDENTICAL condition watermarked; StreamingSpec
    * asserts pair parity between the two. */
  def e4IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        unix_micros(col("ts")).as("error_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_us"))
    val bandUs = 10L * 60 * 1000000
    errors.join(clicks, Seq("user_id"))
      .filter(col("click_us") > col("error_us") - bandUs &&
        col("click_us") <= col("error_us"))
      .select(col("user_id"), col("error_id"), col("click_id"),
        (col("error_us") - col("click_us")).as("lag_us"))
  }

  /** Structured Streaming twins — same aggregation bodies over a
    * file stream with a 1-hour watermark. Driven by ScalaTest with a
    * memory sink (complete/append) and asserted equal to e1/e2. */
  def tumblingStream(s: SparkSession, dir: String): DataFrame =
    tumblingAgg(Tables.eventsStream(s, dir).withWatermark("ts", "1 hour"))

  def slidingStream(s: SparkSession, dir: String): DataFrame =
    slidingAgg(Tables.eventsStream(s, dir).withWatermark("ts", "1 hour"))

  /** Streaming exact dedup — at-least-once ingestion dedup by
    * event_id via `dropDuplicatesWithinWatermark`: state holds one
    * entry per id seen inside the watermark horizon and is evicted as
    * the watermark advances — bounded state, the streaming twin of
    * d1's batch dedup. The duplicated input (self-union, every event
    * arriving twice) models a redelivering source; ScalaTest asserts
    * the deduped stream carries exactly the batch-distinct count. */
  def dedupedStream(s: SparkSession, dir: String): DataFrame = {
    val es = Tables.eventsStream(s, dir).withWatermark("ts", "1 hour")
    es.union(es).dropDuplicatesWithinWatermark("event_id")
  }

  /** Stream-stream interval join — the streaming twin of the
    * TemporalJoins.j6 trailing-window semantics: each 'error' joins
    * the same user's 'click's from the preceding 10 minutes. The
    * watermarks on BOTH sides plus the event-time range condition are
    * what make the join state BOUNDED: Spark evicts buffered rows
    * once the watermark passes the range — without them a
    * stream-stream join would buffer both streams forever. Inner
    * join → matches emit immediately (append mode), no
    * watermark-delayed output. ScalaTest asserts exact pair parity
    * with the batch inequality join. */
  def intervalJoinStream(s: SparkSession, dir: String): DataFrame = {
    val clicks = Tables.eventsStream(s, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val errors = Tables.eventsStream(s, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        col("user_id").as("e_user"), col("ts").as("error_ts"))
      .withWatermark("error_ts", "1 hour")
    errors.join(clicks,
        col("e_user") === col("c_user") &&
          col("click_ts") > col("error_ts") - expr("INTERVAL 10 MINUTES") &&
          col("click_ts") <= col("error_ts"))
      .select(col("error_id"), col("click_id"),
        col("e_user").as("user_id"))
  }

  /** E6 — TIME-DECAYED trending counts (exponential decay, half-life
    * = one day): the recency-weighted twin of a plain count, the
    * primitive behind every "trending now" surface — yesterday's
    * burst fades by ×½ per day instead of dominating forever.
    * decayed(type) = Σ_days n(type, day) · 2^(day − max_day).
    *
    * Scale shape: ONE hash aggregate to (type, day) — bounded at
    * |types| × |days| — then the decay fold over that tiny frame;
    * the max-day scalar attaches via the repo's standard
    * crossJoin(broadcast(agg)) pattern. The raw stream is touched
    * once, like e1.
    *
    * Determinism across engines: the decay factor is λ = ½, so every
    * weight is an EXACT power of two built by integer shift + exact
    * IEEE division (never libm pow, whose last-ulp behavior is
    * engine-specific), terms are count/2^e with a ≤ 45-bit joint
    * span over the 30-day window — the double sum is exact in any
    * order, so the oracle replays it verbatim. Spans ≥ 63 days are
    * clamped to an exact 0.0 weight in BOTH engines (Spark's
    * shiftleft wraps mod 64 and DuckDB's << zeroes — the clamp keeps
    * them agreeing on arbitrarily old data, and 2⁻⁶³ underflows the
    * count scale anyway). [[DecayedTrendStream]]
    * is the incremental twin: state ← state·λ + batch, which unrolls
    * to the identical sum with day = batch index. */
  def e6DecayedTrend(s: SparkSession, dir: String): DataFrame = {
    val perDay = Tables.events(s, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
    val mx = perDay.agg(max("day").as("max_day"))
    perDay.crossJoin(broadcast(mx))
      .select(col("event_type"), col("n"),
        // exponent clamp: Spark's shiftleft wraps mod 64 (weight
        // garbage) and DuckDB's << yields 0 (division by NULL) for
        // spans ≥ 63, so both engines pin the weight to an exact 0.0
        // there — sound because 2⁻⁶³ underflows the count scale at
        // the r6 quantization anyway
        when(col("max_day") - col("day") >= 63, lit(0.0))
          .otherwise(col("n") /
            expr("shiftleft(1L, cast(max_day - day AS int))")).as("w"))
      .groupBy("event_type")
      .agg(sum("n").cast("bigint").as("n_total"),
        Det.r6(sum("w")).as("decayed_count"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e6_decayed_trend" -> e6DecayedTrend,
    "e1_stream_tumbling" -> e1StreamTumbling,
    "e2_stream_sliding" -> e2StreamSliding,
    "e3_stream_session" -> e3StreamSession,
    "e3b_session_window" -> e3bSessionWindowBatch,
    "e4_interval_join" -> e4IntervalJoin,
    "e5_funnel" -> e5Funnel)

  val oracle: Map[String, String] = Map(
    // exact power-of-two weights (integer shift + float division —
    // both engines' `/` on that pair is IEEE division), exact sum
    "e6_decayed_trend" ->
      s"""WITH d AS (
           SELECT event_type,
             cast(floor(epoch_us(ts) / 86400000000) AS bigint) AS day,
             cast(count(*) AS bigint) AS n
           FROM events GROUP BY 1, 2),
         m AS (SELECT max(day) AS max_day FROM d)
         SELECT event_type,
           cast(sum(n) AS bigint) AS n_total,
           ${Det.sql(
            "sum(CASE WHEN max_day - day >= 63 THEN 0.0 ELSE " +
              "n / (cast(1 AS bigint) << cast(max_day - day AS int)) " +
              "END)",
            6)} AS decayed_count
         FROM d, m GROUP BY event_type""",
    "e1_stream_tumbling" ->
      s"""SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts))
           AS window_start_us,
         event_type, count(*) AS n_events,
         ${Det.sqlDsum2("value")} AS sum_value
         FROM events GROUP BY 1, 2""",
    "e2_stream_sliding" ->
      s"""SELECT epoch_us(time_bucket(INTERVAL '30 minutes', ts)
             - k.k * INTERVAL '30 minutes') AS window_start_us,
         event_type, count(*) AS n_events,
         ${Det.sqlDsum2("value")} AS sum_value
         FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
         GROUP BY 1, 2""",
    "e3_stream_session" ->
      s"""WITH t AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
           FROM events),
         flagged AS (
           SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000
                            OR lag(ts_us) OVER w IS NULL
                          THEN 1 ELSE 0 END AS new_session
           FROM t
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         sessions AS (
           SELECT *, sum(new_session) OVER
             (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
           FROM flagged)
         SELECT user_id, cast(session_id AS bigint) AS session_id,
           count(*) AS n_events,
           cast(max(ts_us) - min(ts_us) AS bigint) AS duration_us,
           ${Det.sqlDsum2("value")} AS sum_value
         FROM sessions GROUP BY 1, 2""",
    "e3b_session_window" ->
      s"""WITH t AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
           FROM events),
         flagged AS (
           SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                            OR ts_us - lag(ts_us) OVER w >= 1800000000
                          THEN 1 ELSE 0 END AS new_session
           FROM t
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         sessions AS (
           SELECT *, sum(new_session) OVER
             (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged)
         SELECT user_id, min(ts_us) AS session_start_us,
           count(*) AS n_events, ${Det.sqlDsum2("value")} AS sum_value
         FROM sessions GROUP BY user_id, sid""",
    "e4_interval_join" ->
      """SELECT e.user_id,
         e.event_id AS error_id, c.event_id AS click_id,
         epoch_us(e.ts) - epoch_us(c.ts) AS lag_us
         FROM events e JOIN events c ON e.user_id = c.user_id
         WHERE e.event_type = 'error' AND c.event_type = 'click'
           AND c.ts > e.ts - INTERVAL 10 MINUTE
           AND c.ts <= e.ts""",
    "e5_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1
                    FROM events WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
               GROUP BY 1),
         p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase'
                 AND epoch_us(e.ts) > c.t2
               GROUP BY 1)
         SELECT 'view' AS stage, cast(count(*) AS bigint) AS n_users
         FROM v
         UNION ALL
         SELECT 'click', cast(count(*) AS bigint) FROM c
         UNION ALL
         SELECT 'purchase', cast(count(*) AS bigint) FROM p""")
}

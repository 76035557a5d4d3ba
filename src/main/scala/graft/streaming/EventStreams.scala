package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Typed event row for the stateful operators. */
case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

/** Running per-user aggregate maintained by [[EventStreams.userRunningTotals]]. */
case class UserTotals(user_id: Long, n_events: Long, total_value: Double, last_ts: Long)

/** Per-(user, UTC day) totals for [[EventStreams.userDailyTotals]]. */
case class UserDayTotals(user_id: Long, day: String, n_events: Long, total_value: Double)

/** Welford running-variance state for [[EventStreams.anomalies]]. */
case class ValueStats(user_id: Long, n: Long, mean: Double, m2: Double)

/** One emitted anomaly: an event deviating from its user's running mean. */
case class Anomaly(user_id: Long, event_id: Long, value: Double, mean_at_detection: Double)

/**
 * Structured Streaming forms of the event operators. Every transform here
 * is written against a plain DataFrame, so the SAME code path serves
 * `spark.read` (batch — what the DuckDB oracle checks via EventQueries)
 * and `spark.readStream` (incremental) — Spark's unified Dataset API is
 * the point: correctness is proven on the batch side, and the streaming
 * side only adds watermarking/output-mode concerns, pinned by
 * EventStreamsSpec.
 *
 * Scale notes: windowed aggregations shuffle once on (window, key) with
 * partial aggregation; state store size is bounded by the watermark
 * horizon (late data beyond `watermark` is dropped), which is what keeps
 * a 100 TB/day stream's state finite. The mapGroupsWithState operator
 * keys state by user_id — state volume is O(distinct users), and the
 * timeout conf is where production would expire idle users.
 */
object EventStreams {

  /** Tumbling windowed counts per event type (streaming analog of the
    * oracle-checked `events_tumbling_1h`). */
  def tumblingCounts(events: DataFrame, window: String = "1 hour",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src.groupBy(org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 3))).cast("double").as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total_value"))
  }

  /** Per-window top-k heavy users — the standing "trending" query
    * (streaming form of the oracle-checked `events_windowed_topk`). TWO
    * CHAINED stateful aggregations riding Spark's multiple-stateful-
    * operator support: the (window, user) count finalizes at the
    * watermark and feeds the per-window bounded TopKByScore aggregate,
    * so the second operator's state is k hits per open window however
    * many distinct users the stream carries — the state bound that keeps
    * a trending dashboard alive at 100 TB/day. Append mode: each
    * window's top-k emits exactly once, when the watermark closes it
    * (parity with the batch spelling pinned by EventStreamsSpec). */
  def trendingTopK(events: DataFrame, k: Int = 3,
      window: String = "1 hour", watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("w"))
      .agg(graft.functions.TopKByScore(k)(col("n").cast("double"),
        col("user_id")).as("hits"))
      .select(col("w.start").as("w_start"), posexplode(col("hits")))
      .select(col("w_start"), (col("pos") + 1).as("rank"),
        col("col.id").as("user_id"), col("col.score").cast("long").as("n_events"))

  /** Per-user session windows with an inactivity gap (streaming analog of
    * `events_session_2h`; watermark required by Spark in append mode). */
  def sessionCounts(events: DataFrame, gap: String = "2 hours",
      watermark: String = "1 minute"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_last"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("session_start"), col("session_last"), col("n"))

  /** Custom streaming state: running per-user totals via
    * mapGroupsWithState — the arbitrary-state API the built-in windows
    * can't express (cumulative, not windowed). Emits the updated totals
    * for each user touched in a micro-batch.
    *
    * State bound: NoTimeout is deliberate — the operator's CONTRACT is
    * lifetime-cumulative totals, and evicting state would silently reset
    * a returning user to zero (an eviction here is a correctness bug,
    * not a leak fix). Total state is O(distinct users ever seen); when
    * that is unacceptable at 100 TB/day, the fix is bounding the
    * KEYSPACE, not a TTL: see [[userDailyTotals]], which keys by
    * (user, day) and expires each day's state one watermark past day
    * end — bounded state with an explicit, documented semantic. */
  def userRunningTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0, Long.MinValue))
          // deterministic fold: micro-batch rows reduced by (n, sum, max-ts)
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserTotals(userId, acc.n_events + 1, acc.total_value + e.value,
              math.max(acc.last_ts, e.ts.getTime))
          }
          state.update(next)
          next
      }
  }

  /**
   * Bounded-keyspace running totals: the production form of
   * [[userRunningTotals]] for unbounded user populations. Keying by
   * (user, UTC day) makes each state entry FINITE-LIVED by construction:
   * once the event-time watermark passes the end of a day (plus the
   * late-data slack the watermark already encodes), that day's entry
   * emits one final closing record and is removed — total state is
   * O(users active per day), not O(users ever). Intermediate totals are
   * emitted per micro-batch (update semantics); the timeout record is
   * the authoritative day-close value a downstream compactor keeps.
   * In batch execution timeouts never fire and the same call is a
   * single-pass per-(user, day) fold — parity pinned by the spec.
   */
  def userDailyTotals(events: Dataset[Event],
      watermark: String = "1 hour"): Dataset[UserDayTotals] = {
    import events.sparkSession.implicits._
    def dayOf(ms: Long): String =
      java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC)
        .toLocalDate.toString
    // batch execution has no watermark: timeout registration both throws
    // (getCurrentWatermarkMs) and is meaningless there
    val streaming = events.isStreaming
    events.withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, dayOf(e.ts.getTime)))
      .mapGroupsWithState[UserDayTotals, UserDayTotals](
        GroupStateTimeout.EventTimeTimeout) {
        case ((uid, day), batch, state) =>
          if (state.hasTimedOut) {
            val closing = state.get
            state.remove()
            closing
          } else {
            val prev = state.getOption.getOrElse(UserDayTotals(uid, day, 0L, 0.0))
            val next = batch.foldLeft(prev) { (acc, e) =>
              UserDayTotals(uid, day, acc.n_events + 1, acc.total_value + e.value)
            }
            state.update(next)
            if (streaming) {
              val dayEndMs = java.time.LocalDate.parse(day).plusDays(1)
                .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
              // Spark requires the timeout to sit strictly past the
              // current watermark; the day boundary already does except
              // for very late stragglers, where one watermark tick later
              // is the earliest legal close.
              state.setTimeoutTimestamp(
                math.max(dayEndMs, state.getCurrentWatermarkMs() + 1))
            }
            next
          }
      }
  }

  /** Stream-stream interval join: each error joined to same-user clicks
    * landing within `gapSeconds` after it (the streaming form of the
    * batch `events_range_join`). Both sides carry watermarks and the join
    * condition bounds event time in both directions, so Spark can expire
    * join state — the requirement for a stream-stream join to run with
    * finite memory at 100 TB/day. The same call on batch frames is a
    * plain inner join with the identical semantics (parity-pinned).
    *
    * `joinType = "left_outer"` gives the UNMATCHED-ERROR semantics an
    * alerting pipeline needs (errors with NO follow-up click): in
    * streaming, the null-padded row emits only once the watermark proves
    * no qualifying click can still arrive — the same rows a batch left
    * join produces, just certified late (parity-pinned incl. the null
    * rows). */
  def errorClickJoin(events: DataFrame, gapSeconds: Long = 600,
      watermark: String = "30 minutes", joinType: String = "inner"): DataFrame = {
    val errors = events.withWatermark("ts", watermark)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
    val clicks = events.withWatermark("ts", watermark)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    errors.join(clicks,
        col("err_user") === col("click_user") &&
          col("click_ts") > col("err_ts") &&
          col("click_ts") <= col("err_ts") + expr(s"INTERVAL $gapSeconds SECOND"),
        joinType)
      .select(col("err_id"), col("click_id"), col("err_user").as("user_id"),
        col("err_ts"), col("click_ts"))
  }

  /** Streaming exactly-once dedup by event_id, state bounded by the
    * event-time watermark — the streaming half of the dedup family
    * (at-least-once sources re-deliver; this collapses re-deliveries
    * inside the watermark horizon while keeping state finite, the only
    * way streaming dedup survives at 100 TB/day). Keyed on event_id
    * ALONE via dropDuplicatesWithinWatermark, so a re-delivery that was
    * re-stamped with a fresh ts on send (common for at-least-once
    * producers) still collapses — dropDuplicates("event_id","ts") would
    * pass it through as a "new" event. Same call works in batch (global
    * dedup by id — Spark rejects the WithinWatermark form on batch
    * frames, where plain dropDuplicates has the identical id-keyed
    * semantics) — unified-API parity is pinned by EventStreamsSpec. */
  def dedupById(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /**
   * Streaming anomaly detection via flatMapGroupsWithState — the 0..n
   * outputs-per-group shape mapGroupsWithState cannot express: an event
   * is emitted iff it deviates from its user's RUNNING mean by more than
   * `k` standard deviations (Welford state: O(1) per user, exact, no
   * sample buffer — the only state shape that survives 100 TB/day).
   * Events inside a micro-batch are processed in (ts, event_id) order so
   * the emitted set is independent of how the stream is micro-batched
   * (pinned by the batch-split invariance spec). Warm-up: no verdicts
   * until a user has `minHistory` observations.
   *
   * State eviction: per-user state is O(1), but without a timeout the
   * TOTAL state grows with distinct-user cardinality forever. An
   * event-time timeout (watermark discipline, same as the windowed
   * operators) expires users idle longer than `idleHorizon`, so state is
   * bounded by the ACTIVE user set — a user who returns later simply
   * re-warms. Timeouts never fire in batch execution, where the same
   * call degrades to a single-pass fold.
   */
  def anomalies(events: Dataset[Event], k: Double = 3.0,
      minHistory: Int = 5, watermark: String = "10 minutes",
      idleHorizon: String = "30 days"): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    // captured OUTSIDE the state function: in batch execution the
    // watermark node is eliminated and getCurrentWatermarkMs/
    // setTimeoutTimestamp THROW — the batch path must run the same fold
    // with no timeout bookkeeping (same guard as userDailyTotals)
    val streaming = events.isStreaming
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ValueStats, Anomaly](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[ValueStats]) =>
          if (state.hasTimedOut) {
            // user idle past the horizon: drop the Welford state entirely
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(ValueStats(uid, 0L, 0.0, 0.0))
            val out = Vector.newBuilder[Anomaly]
            var maxTs = Long.MinValue
            batch.toVector.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              if (st.n >= minHistory) {
                val sd = math.sqrt(st.m2 / st.n)
                if (sd > 0 && math.abs(e.value - st.mean) > k * sd)
                  out += Anomaly(uid, e.event_id, e.value, st.mean)
              }
              val n1 = st.n + 1
              val d = e.value - st.mean
              val mean1 = st.mean + d / n1
              st = ValueStats(uid, n1, mean1, st.m2 + d * (e.value - mean1))
              maxTs = math.max(maxTs, e.ts.getTime)
            }
            state.update(st)
            if (streaming) {
              // expire this user idleHorizon past their latest event (and
              // strictly past the watermark, which Spark requires)
              val base = math.max(maxTs, state.getCurrentWatermarkMs())
              state.setTimeoutTimestamp(base, idleHorizon)
            }
            out.result().iterator
          }
      }
  }

  /** Batch reference for [[userRunningTotals]]' final state. */
  def userTotalsBatch(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"),
        max(unix_millis(col("ts"))).as("last_ts"))
}

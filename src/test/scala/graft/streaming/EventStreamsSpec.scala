package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-vs-batch parity: the same transforms must produce identical
  * results whether driven incrementally or in one batch. */
class EventStreamsSpec extends AnyFunSuite with SparkTestBase {

  private def batchEvents =
    graft.QueryPack.loadEvents(spark, s"$sf0_001/events.parquet")

  // Spark's file stream source wants a directory; the test fixture is a
  // single parquet file, so stage it into a temp dir once.
  private lazy val streamDir: String = {
    val dir = java.nio.file.Paths.get(scratchDir("events-stream"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0_001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def streamEvents = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf0_001/events.parquet").schema
    graft.QueryPack.adaptEventsTs(
      spark.readStream.schema(schema).parquet(streamDir))
  }

  test("tumblingCounts: streaming (complete mode) == batch") {
    val batch = EventStreams.tumblingCounts(batchEvents)
      .collect().map(_.toSeq).toSet

    val q = EventStreams.tumblingCounts(streamEvents)
      .writeStream.format("memory").queryName("tumbling_parity")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumbling_parity").collect().map(_.toSeq).toSet

    assert(batch.nonEmpty && streamed == batch)
  }

  test("sessionCounts runs incrementally and closed sessions match batch") {
    val q = EventStreams.sessionCounts(streamEvents)
      .writeStream.format("memory").queryName("session_parity")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("session_parity").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    // batch reference via the same groupBy(session_window) shape
    val batch = batchEvents
      .groupBy(session_window(col("ts"), "2 hours"), col("user_id"))
      .agg(min("ts").as("s"), max("ts").as("l"), count(lit(1)).as("n"))
      .select("user_id", "s", "l", "n").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    // append mode only emits sessions closed by the final watermark; all
    // emitted sessions must be a (large) subset of the batch sessions
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= (batch.size * 0.9).toInt,
      s"only ${streamed.size} of ${batch.size} sessions emitted")
  }

  test("trendingTopK: chained stateful aggs emit closed windows matching batch") {
    val q = EventStreams.trendingTopK(streamEvents)
      .writeStream.format("memory").queryName("trending_parity")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("trending_parity").collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("w"))
      .agg(graft.functions.TopKByScore(3)(col("n").cast("double"),
        col("user_id")).as("hits"))
      .select(col("w.start").as("w_start"), posexplode(col("hits")))
      .select(col("w_start"), (col("pos") + 1).as("rank"),
        col("col.id").as("user_id"), col("col.score").cast("long").as("n_events"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

    // append mode only emits watermark-CLOSED windows; every emitted
    // top-k row must match batch exactly, and nearly every window closes
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed rows not in batch: ${(streamed -- batch).take(3)}")
    assert(streamed.size >= (batch.size * 0.9).toInt,
      s"only ${streamed.size} of ${batch.size} trending rows emitted")
  }

  test("watermark drops events older than the horizon in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, ts: String) =
      Event(id, java.sql.Timestamp.valueOf(ts), user_id = 1L, "click", 1.0, "{}")

    val input = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(input.toDS().toDF(),
        window = "1 hour", watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("wm_drop")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: window 10:00 gets one event; 12:30 advances the
      // watermark to 12:20, past 11:00, so window 10:00 closes with n=1
      input.addData(ev(1, "2026-01-01 10:05:00"), ev(2, "2026-01-01 12:30:00"))
      q.processAllAvailable()
      // batch 2: event 3 is BEHIND the 12:20 watermark -> must be dropped;
      // event 4 is on time for the open 12:00 window; event 5 advances the
      // watermark to 13:50, closing window 12:00 with n=2 (events 2+4)
      input.addData(ev(3, "2026-01-01 10:10:00"), ev(4, "2026-01-01 12:40:00"),
        ev(5, "2026-01-01 14:00:00"))
      q.processAllAvailable()
    } finally q.stop()

    val emitted = spark.table("wm_drop")
      .select(date_format(col("w_start"), "HH:mm").as("w"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the late event changed nothing: 10:00 emitted once with n=1, and the
    // on-time batch-2 event DID count (12:00 has n=2), so the late drop is
    // the watermark, not a stalled batch
    assert(emitted == Map("10:00" -> 1L, "12:00" -> 2L))
  }

  test("errorClickJoin: stream-stream interval join == batch join") {
    val q = EventStreams.errorClickJoin(streamEvents)
      .writeStream.format("memory").queryName("ss_join_parity")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ss_join_parity")
      .select("err_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val batch = EventStreams.errorClickJoin(batchEvents)
      .select("err_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(batch.nonEmpty && streamed == batch)
  }

  test("errorClickJoin left_outer: unmatched error emits null-padded after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, ts: String, user: Long, typ: String) =
      Event(id, java.sql.Timestamp.valueOf(ts), user, typ, 1.0, "{}")

    val b1 = Seq(
      ev(1, "2026-01-01 10:00:00", 1, "error"),
      ev(2, "2026-01-01 10:05:00", 1, "click"), // matches error 1 (300s)
      ev(3, "2026-01-01 10:00:00", 2, "error"), // no click ever
      ev(4, "2026-01-01 10:30:00", 1, "error"),
      ev(5, "2026-01-01 10:50:00", 1, "click")) // 1200s after 4: outside band
    // advance batches carry BOTH types: the branch filters push below the
    // watermark nodes, so the global watermark is the MIN across branches
    // — a click-only batch leaves the error branch's watermark (and
    // therefore null-row eviction) frozen. That min-of-branches rule is
    // itself the semantics under test here.
    val b2 = Seq(ev(8, "2026-01-01 13:00:00", 98, "error"),
      ev(9, "2026-01-01 13:00:00", 99, "click"))
    val b3 = Seq(ev(11, "2026-01-01 15:00:00", 96, "error"),
      ev(10, "2026-01-01 15:00:00", 99, "click"))

    val input = MemoryStream[Event]
    val q = EventStreams.errorClickJoin(input.toDS().toDF(), joinType = "left_outer")
      .writeStream.format("memory").queryName("ss_outer_join")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("err_id", "click_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
    val streamed = pairs(spark.table("ss_outer_join"))
    // certainties by the b3-era watermark (12:30, past every b1 band
    // end): the matched pair emitted at match time, the b1 unmatched
    // errors emitted null-padded at state eviction
    val certain = Set(1L -> Some(2L), 3L -> (None: Option[Long]),
      4L -> (None: Option[Long]))
    assert(certain.subsetOf(streamed))
    // no spurious rows: everything emitted is a row of the batch answer
    // (the tail errors 8/11 may still be open — certified-late, not lost)
    val batch = pairs(EventStreams.errorClickJoin(
      (b1 ++ b2 ++ b3).toDS().toDF(), joinType = "left_outer"))
    assert(batch == certain ++ Set(8L -> None, 11L -> None))
    assert(streamed.subsetOf(batch))
  }

  test("dedupById collapses re-deliveries across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, ts: String) =
      Event(id, java.sql.Timestamp.valueOf(ts), 1L, "click", 1.0, "{}")

    val input = MemoryStream[Event]
    val q = EventStreams.dedupById(input.toDS().toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(1, "2026-01-01 10:00:00"), ev(2, "2026-01-01 10:01:00"),
        ev(1, "2026-01-01 10:00:00")) // dup within the batch
      q.processAllAvailable()
      input.addData(ev(1, "2026-01-01 10:00:30"), // re-delivery, RE-STAMPED ts
        ev(3, "2026-01-01 10:02:00"))
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted
    // the re-stamped re-delivery of id 1 must still collapse: dedup is
    // keyed on event_id alone, not (event_id, ts)
    assert(ids.sameElements(Array(1L, 2L, 3L)))

    // unified API: the same transform on a batch frame is a global dedup
    val batchDeduped = EventStreams.dedupById(
      Seq(ev(1, "2026-01-01 10:00:00"), ev(1, "2026-01-01 10:00:45"),
        ev(2, "2026-01-01 10:01:00")).toDS().toDF())
    assert(batchDeduped.count() == 2)
  }

  test("anomalies: flatMapGroupsWithState flags running-mean outliers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, value: Double) =
      Event(id, java.sql.Timestamp.valueOf(s"2026-01-01 10:00:${"%02d".format(id)}"),
        1L, "click", value, "{}")
    // 8 stable observations (alternating 1.0/2.0), then a spike
    val stable = (0L until 8L).map(i => ev(i, 1.0 + (i % 2)))
    val spike = ev(8L, 100.0)
    val calm = ev(9L, 1.0)

    def run(batches: Seq[Seq[Event]], name: String): Set[Long] = {
      val input = MemoryStream[Event]
      val q = EventStreams.anomalies(input.toDS(), k = 3.0, minHistory = 5)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).select("event_id").collect().map(_.getLong(0)).toSet
    }

    val oneBatch = run(Seq(stable :+ spike :+ calm), "anom_one")
    assert(oneBatch == Set(8L)) // only the spike flags; calm event after is fine
    // micro-batching must not change the verdicts (state carries over)
    val split = run(Seq(stable.take(4), stable.drop(4), Seq(spike, calm)), "anom_split")
    assert(split == oneBatch)

    // batch-execution parity: the SAME call on a bounded Dataset runs the
    // fold with no watermark node, so timeout bookkeeping (which would
    // throw GroupStateImpl errors in batch) must be skipped — and the
    // verdicts must match the streaming run
    val batchVerdicts = EventStreams.anomalies(
        (stable :+ spike :+ calm).toDS(), k = 3.0, minHistory = 5)
      .collect().map(_.event_id).toSet
    assert(batchVerdicts == oneBatch)
  }

  test("userDailyTotals: day closes emit final totals and evict state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, ts: String, v: Double) =
      Event(id, java.sql.Timestamp.valueOf(ts), 7L, "click", v, "{}")

    val input = MemoryStream[Event]
    val q = EventStreams.userDailyTotals(input.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("daily_totals")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(ev(1, "2026-01-01 10:00:00", 1.0), ev(2, "2026-01-01 11:00:00", 2.0))
      q.processAllAvailable()
      // next day, far past day-1 end: advances the watermark beyond the
      // day-1 timeout timestamp
      input.addData(ev(3, "2026-01-02 12:00:00", 5.0))
      q.processAllAvailable()
      // one more batch so the expired day-1 state actually fires
      input.addData(ev(4, "2026-01-02 13:00:00", 7.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("daily_totals")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // the day-1 closing record carries the full-day totals
    assert(rows.contains(("2026-01-01", 2L, 3.0)), s"no day-1 close in $rows")
    // day-2 intermediate totals are emitted per batch
    assert(rows.contains(("2026-01-02", 2L, 12.0)), s"no day-2 update in $rows")

    // batch execution: same call is a per-(user, day) fold
    val batch = EventStreams.userDailyTotals(
      Seq(ev(1, "2026-01-01 10:00:00", 1.0), ev(2, "2026-01-01 11:00:00", 2.0),
        ev(3, "2026-01-02 12:00:00", 5.0)).toDS())
      .collect().map(t => (t.day, t.n_events, t.total_value)).toSet
    assert(batch == Set(("2026-01-01", 2L, 3.0), ("2026-01-02", 1L, 5.0)))
  }

  test("userRunningTotals: final mapGroupsWithState state == batch totals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.as[Event].collect().toSeq

    val input = MemoryStream[Event]
    val q = EventStreams.userRunningTotals(input.toDS())
      .writeStream.format("memory").queryName("running_totals")
      .outputMode(OutputMode.Update()).start()
    try {
      // feed in two micro-batches to exercise state carry-over
      val (first, second) = rows.splitAt(rows.size / 2)
      input.addData(first); q.processAllAvailable()
      input.addData(second); q.processAllAvailable()
    } finally q.stop()

    // last emitted row per user = final state
    val finalState = spark.table("running_totals")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("total_value"), col("last_ts"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.total_value"), col("s.last_ts"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100), r.getLong(3))))
      .toMap

    val batch = EventStreams.userTotalsBatch(batchEvents).collect()
      .map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100), r.getLong(3))))
      .toMap

    assert(finalState == batch)
  }

  test("CmsSignals.sketch: streamed sketch == batch sketch; bounded state; estimates never undercount") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.CmsSignals
    val (d, w) = (4, 64)

    val ids = batchEvents.select(col("user_id")).limit(400)
      .collect().map(_.getLong(0))

    val input = MemoryStream[Long]
    val q = CmsSignals.sketch(input.toDF().toDF("user_id"), "user_id", d, w)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(ids.take(150): _*)
      q.processAllAvailable()
      input.addData(ids.drop(150): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cms_stream")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    // the sketch is bit-identical to the one-shot batch build: counters
    // are order-independent sums over a deterministic hash spelling
    val batchSk = CmsSignals.sketch(ids.toSeq.toDF("user_id"), "user_id", d, w)
    val batch = batchSk
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    // state is bounded by the d×w key space however long the stream runs
    assert(streamed.size <= d * w)

    // CMS contract: estimate >= exact for every id
    val exact = ids.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val est = CmsSignals.estimate(batchSk, ids.toSeq.toDF("user_id"),
        "user_id", d, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (id, n) =>
      assert(est(id) >= n, s"CMS undercounted id $id: ${est(id)} < $n")
    }
  }
}

package graft.queries

import graft.QueryPack
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Event-stream operators over the `events` table: tumbling / sliding /
 * session time windows and schemaless JSON property access — the batch
 * forms of the Structured Streaming ops in [[graft.streaming]] (same
 * `window()` / `session_window()` calls work on readStream inputs; the
 * reference stores timestamps but never queries them, SURVEY §2.D).
 *
 * Scale design: tumbling/sliding windows are plain hash aggregations on
 * (bucket, key) — partial-agg friendly, one shuffle. The session window
 * shuffles once on user_id (Spark plans session_window as a single
 * partial-merge agg over the session keys); skewed users would be the
 * thing to watch at 100 TB, mitigable with AQE skew handling since it is
 * an agg, not a join. JSON extraction is a codegen'd path expression —
 * no UDF, stays inside WholeStageCodegen.
 *
 * Determinism: sums of the double `value` go through exact DECIMAL;
 * session bounds use min/max aggregates (not Spark's synthetic
 * window.end = last+gap, which no other engine reproduces).
 */
object EventQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // Tumbling 1-hour counts per event type.
    "events_tumbling_1h" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 3))).cast("double").as("total_value"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total_value"))
        .orderBy(col("w_start"), col("event_type"))),

    // Per-window top-k ("trending"): the heaviest users of each 1-hour
    // window. Two bounded partial-agg shuffles — the (window, user)
    // count, then TopKByScore per window, so only partitions × k
    // candidate rows per window cross the second shuffle and the final
    // state is k rows per window however many distinct users exist.
    // The same two-agg shape runs STANDING as
    // `EventStreams.trendingTopK` (chained stateful aggregations,
    // append mode, k-rows-per-window state) — parity spec'd.
    "events_windowed_topk" -> ((s, dir) => {
      val counts = events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("user_id"), col("n"))
      counts.groupBy(col("w_start"))
        .agg(graft.functions.TopKByScore(3)(col("n").cast("double"),
          col("user_id")).as("hits"))
        .select(col("w_start"), posexplode(col("hits")))
        .select(col("w_start"), (col("pos") + 1).as("rank"),
          col("col.id").as("user_id"), col("col.score").cast("long").as("n_events"))
        .orderBy(col("w_start"), col("rank"))
    }),

    // Sliding windows: 1-hour duration every 30 minutes (each event lands
    // in exactly 2 windows).
    "events_sliding_1h_30m" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("n"))
        .orderBy(col("w_start"))),

    // Session windows per user with a 2-hour inactivity gap. Bounds are
    // reported as min/max event time so the oracle can reproduce them.
    "events_session_2h" -> ((s, dir) =>
      events(s, dir)
        .groupBy(session_window(col("ts"), "2 hours").as("w"), col("user_id"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_last"),
          count(lit(1)).as("n"))
        .select(col("user_id"), col("session_start"), col("session_last"), col("n"))
        .orderBy(col("user_id"), col("session_start"))),

    // As-of join: each click paired with the most recent error (same
    // user) at or before it. Expressed as union + running last_value over
    // one user_id window — a single shuffle and zero pairwise work, the
    // scale-safe as-of shape (a range join would explode; DuckDB's native
    // ASOF JOIN is the oracle).
    "events_asof_error" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir).filter(col("event_type").isin("click", "error"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
          when(col("event_type") === "error", col("event_id")).as("err_id_src"),
          when(col("event_type") === "error", col("ts")).as("err_ts_src"),
          // at an identical timestamp the error must sort before the
          // click so `ts >= err_ts` includes same-instant matches
          when(col("event_type") === "error", 0).otherwise(1).as("tag_order"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag_order"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("err_id", last(col("err_id_src"), ignoreNulls = true).over(w))
        .withColumn("err_ts", last(col("err_ts_src"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("err_id"), col("err_ts"))
        .orderBy(col("event_id"))
    }),

    // Range join: clicks within 10 minutes AFTER a same-user error.
    // Scale shape: candidates are blocked by a 10-minute time bucket —
    // the click side probes (bucket, bucket+1) so every true pair shares
    // a key, then the exact range predicate filters. The join is a plain
    // equi-join on (user_id, bucket): no unbounded theta-join, candidate
    // volume bounded by bucket occupancy.
    "events_range_join" -> ((s, dir) => {
      val gap = 600L // seconds
      val ev = events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"),
          floor(unix_timestamp(col("ts")) / gap).as("bucket"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("click_ts"))
        .withColumn("bucket",
          explode(array(floor(unix_timestamp(col("click_ts")) / gap),
            floor(unix_timestamp(col("click_ts")) / gap) - 1)))
      errors.join(clicks,
          errors("user_id") === clicks("c_user") && errors("bucket") === clicks("bucket"))
        .filter(col("click_ts") > col("err_ts") &&
          col("click_ts") <= col("err_ts") + expr(s"INTERVAL $gap SECOND"))
        .select(col("err_id"), col("click_id"), col("user_id"),
          col("err_ts"), col("click_ts"))
        .orderBy(col("err_id"), col("click_id"))
    }),

    // The LEFT OUTER band join — errors with NO follow-up click inside
    // the window ride along null-padded (the alerting shape: an
    // unacknowledged error IS the signal). Registered through the SAME
    // unified function the stream runs
    // ([[graft.streaming.EventStreams.errorClickJoin]] with
    // joinType=left_outer): on a batch frame it's a plain outer join;
    // under a stream the null row emits once the watermark proves no
    // qualifying click can still arrive (EventStreamsSpec pins the null
    // rows cross-batch). Oracle is DuckDB's LEFT JOIN with the band in
    // the ON clause.
    "events_range_join_outer" -> ((s, dir) =>
      graft.streaming.EventStreams.errorClickJoin(
          events(s, dir), joinType = "left_outer")
        .orderBy(col("err_id"), col("click_id"))),

    // Out-of-orderness profile — the analytic that PICKS the watermark
    // the streaming operators above assume: how late does an event
    // arrive relative to the max event time already ingested? Arrival
    // order is the ingest sequence (event_id); lateness is measured
    // against the max event time of STRICTLY EARLIER arrival buckets,
    // so the whole computation is one bucket-level rollup (N/1000
    // rows), a running max over that TINY table (the only window —
    // single-partition but bucket-count-sized, never row-sized), and a
    // broadcast join back. Per type: late-row counts at the 1m/10m
    // horizons and the max observed lateness — read off directly what
    // `withWatermark` delay bounds the loss rate.
    "events_lateness_profile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
        .withColumn("bucket", expr("event_id div 1000"))
        .withColumn("us", unix_micros(col("ts")))
      val bmax = ev.groupBy(col("bucket")).agg(max(col("us")).as("bmax"))
      val w = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prior = bmax.select(col("bucket"),
        max(col("bmax")).over(w).as("prior_max"))
      ev.join(broadcast(prior), "bucket")
        .withColumn("late_us",
          greatest(lit(0L), coalesce(col("prior_max") - col("us"), lit(0L))))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum((col("late_us") > 60L * 1000000L).cast("long")).as("n_late_1m"),
          sum((col("late_us") > 600L * 1000000L).cast("long")).as("n_late_10m"),
          max(col("late_us")).as("max_late_us"))
        .orderBy(col("event_type"))
    }),

    // Exact interpolated quantiles of value per event type (continuous
    // definition, identical in DuckDB's quantile_cont).
    "events_value_quantiles" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round6(expr("percentile(value, 0.5)")).as("p50"),
          round6(expr("percentile(value, 0.9)")).as("p90"),
          round6(expr("percentile(value, 0.99)")).as("p99"))
        .orderBy(col("event_type"))),

    // Funnel analysis: signup -> first click after signup -> first
    // purchase after that click, counted per stage. Each stage is one
    // aggregation + an equi-join on user_id (broadcast when small, AQE
    // otherwise); no sequence UDF, no per-user sorting — the ordered-
    // sequence semantics live entirely in the min-after-threshold aggs.
    "events_funnel" -> ((s, dir) => {
      val ev = events(s, dir)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
      val cl = ev.filter(col("event_type") === "click")
        .join(su, "user_id").filter(col("ts") > col("s_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(cl, "user_id").filter(col("ts") > col("c_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      su.agg(count(lit(1)).as("n_signup")).crossJoin(
          cl.agg(count(lit(1)).as("n_click_after_signup"))).crossJoin(
          pu.agg(count(lit(1)).as("n_purchase_after_click")))
    }),

    // The funnel with a CONVERSION DEADLINE — product-analytics funnel
    // semantics proper: each stage counts only within 72 h of the
    // previous stage's first completion (an unbounded funnel credits a
    // purchase a year later to last spring's campaign). Same
    // stage-chained min-aggregate shape as events_funnel — per stage one
    // filter + one per-user partial agg, each join keyed on user — plus
    // exact-ratio conversion rates; the deadline is the only delta, so
    // diffing the two queries' counts shows exactly what the window
    // excludes.
    // Peak concurrency — the classic boundary-sweep interval problem
    // (how many 30-minute activity intervals overlap at the worst
    // moment, per event type): each event contributes +1 at ts and -1 at
    // ts+30m, the running sum over type-ordered boundaries is the live
    // concurrency, and its max (earliest instant on ties) is the answer
    // capacity planning reads. Deltas order (time asc, delta asc) so an
    // end meeting a start closes FIRST — touching intervals don't
    // overlap. The window is keyed per type (bounded groups); the 100 TB
    // form is the GREEN sibling `events_peak_concurrency_sharded` below
    // (day shards + boundary-carry stitch, hash-proven equal to this
    // global sweep).
    "events_peak_concurrency" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
      val bounds = ev.select(col("event_type"), col("ts").as("t"),
          lit(1).as("delta"))
        .unionByName(ev.select(col("event_type"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("t"),
          lit(-1).as("delta")))
      val w = Window.partitionBy("event_type").orderBy(col("t"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val live = bounds.withColumn("live", sum(col("delta")).over(w))
      val peaks = live.groupBy(col("event_type"))
        .agg(max(col("live")).as("peak"))
      live.join(broadcast(peaks), "event_type")
        .filter(col("live") === col("peak"))
        .groupBy(col("event_type"), col("peak"))
        .agg(min(col("t")).as("peak_at"))
        .orderBy(col("event_type"))
    }),

    // The SHARDED spelling of the sweep above (VERDICT r12 ask #5) — at
    // 100 TB one type's boundary stream outgrows a single window
    // partition, so the production sweep shards by DAY and stitches with
    // boundary carries, the same decomposition as the sketch shard
    // merges: the running sum at any boundary equals (sum of all prior
    // days' total deltas) + (the running sum within its own day),
    // because the global (t, delta) order restricted to a day IS the
    // within-day order. Each (type, day) window is bounded by one day's
    // boundaries; the carry table is one row per (type, day) — tiny,
    // broadcast. The identity is algebraic, so the result hash-matches
    // the GLOBAL sweep's oracle row for row: shard + stitch == global,
    // proven by the driver, not claimed in prose.
    "events_peak_concurrency_sharded" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
      val bounds = ev.select(col("event_type"), col("ts").as("t"),
          lit(1).as("delta"))
        .unionByName(ev.select(col("event_type"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("t"),
          lit(-1).as("delta")))
        .withColumn("day", to_date(col("t")))
      val wLocal = Window.partitionBy("event_type", "day")
        .orderBy(col("t"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wCarry = Window.partitionBy("event_type").orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carries = bounds.groupBy(col("event_type"), col("day"))
        .agg(sum(col("delta")).as("day_delta"))
        .withColumn("carry",
          coalesce(sum(col("day_delta")).over(wCarry), lit(0L)))
        .select(col("event_type"), col("day"), col("carry"))
      val live = bounds
        .withColumn("local_live", sum(col("delta")).over(wLocal))
        .join(broadcast(carries), Seq("event_type", "day"))
        .withColumn("live", col("local_live") + col("carry"))
      val peaks = live.groupBy(col("event_type"))
        .agg(max(col("live")).as("peak"))
      live.join(broadcast(peaks), "event_type")
        .filter(col("live") === col("peak"))
        .groupBy(col("event_type"), col("peak"))
        .agg(min(col("t")).as("peak_at"))
        .orderBy(col("event_type"))
    }),

    // Merged-interval coverage — the interval-union dual of the sweep
    // above: per user, how much wall-clock the 30-minute activity
    // intervals actually COVER once overlaps merge (billing/engagement
    // time, not event counts), plus how many merged sessions they form.
    // Islands construction: an interval starts a new island iff its
    // start exceeds the running max end of all earlier intervals; both
    // engines spell the same running-max window, and coverage sums
    // per-island (max end - min start) as exact integer seconds.
    "events_interval_coverage" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byStart = Window.partitionBy("user_id")
        .orderBy(col("s"), col("e"), col("event_id"))
      val iv = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("s"),
        (unix_timestamp(col("ts")) + 1800L).as("e"))
      val isl = iv
        .withColumn("prev_max_e",
          max(col("e")).over(byStart.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_island",
          (col("prev_max_e").isNull || col("s") > col("prev_max_e"))
            .cast("long"))
        .withColumn("island",
          sum(col("new_island")).over(byStart
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      isl.groupBy(col("user_id"), col("island"))
        .agg(min(col("s")).as("is_s"), max(col("e")).as("is_e"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("is_e") - col("is_s")).as("covered_sec"))
        .orderBy(col("user_id"))
    }),

    // First-order Markov transition matrix over per-user event journeys
    // — the model behind events_path_topk's raw paths (next-step
    // prediction, absorbing-state detection, journey simulation). One
    // per-user lead window (the same keyed sort path_topk pays), then
    // transition counts and an exact-rational row-normalized probability:
    // P(to|from) = n(from,to) / n(from,*) as a round6'd integer ratio.
    // The matrix is |types|² tiny at any corpus size — the whole model
    // fits in a broadcast once the one shuffle is paid.
    "events_markov_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = events(s, dir)
        .select(col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val outTotals = trans.groupBy(col("from_type"))
        .agg(sum(col("n")).as("n_out"))
      trans.join(broadcast(outTotals), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          round6(col("n") / col("n_out")).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    "events_funnel_windowed" -> ((s, dir) => {
      val win = expr("INTERVAL 72 HOURS")
      val ev = events(s, dir)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
      val cl = ev.filter(col("event_type") === "click")
        .join(su, "user_id")
        .filter(col("ts") > col("s_ts") && col("ts") <= col("s_ts") + win)
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(cl, "user_id")
        .filter(col("ts") > col("c_ts") && col("ts") <= col("c_ts") + win)
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      su.agg(count(lit(1)).as("n_signup")).crossJoin(
          cl.agg(count(lit(1)).as("n_click_72h"))).crossJoin(
          pu.agg(count(lit(1)).as("n_purchase_72h")))
        .select(col("n_signup"), col("n_click_72h"), col("n_purchase_72h"),
          round6(col("n_click_72h") / col("n_signup")).as("click_rate"),
          round6(col("n_purchase_72h") / col("n_click_72h"))
            .as("purchase_rate"))
    }),

    // Cohort retention: users grouped by first-seen day; D1/D7 retention
    // = share of the cohort active again exactly N days later. Two
    // aggregations and one equi-join on user_id — the multi-day activity
    // matrix never materializes, only (user, day) distinct pairs.
    // Pareto concentration — how top-heavy is the workload (the
    // skew-planning twin of events_salted_user_counts: THIS measures the
    // concentration that query defends against): smallest user set
    // covering 80% of events, found on the cumulative sum over the
    // per-USER rollup (users ≪ events). The ordered cut rides
    // GlobalOrder.rankCumsum — exact window below the row threshold,
    // range-partitioned two-pass rank/prefix-sum above it, so no
    // single-task sort stage however many users exist; both branches are
    // bit-identical and each is oracle-hash-checked at the SFs where it
    // runs. The 80% cut compares cross-multiplied integers
    // (cum*5 >= total*4), so the threshold row — and the hash — is exact.
    "events_pareto_concentration" -> ((s, dir) => {
      val uc = events(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // rankCumsum + tot reuse it; never recompute events
      // 1000-row threshold (vs the 10k default): the events fixture has
      // 15/150/1500 users across SFs, so sf0.1 — and the 10x blow-up —
      // exercise the distributed branch in the real query, not only in
      // GlobalOrderSpec
      val cum = graft.ml.GlobalOrder.rankCumsum(uc,
        Seq(col("n").desc, col("user_id")), valueCol = Some("n"),
        exactWindowMaxRows = 1000L)
      val tot = uc.agg(sum(col("n")).as("total"),
        count(lit(1)).as("n_users"))
      cum.crossJoin(broadcast(tot))
        .filter(col("cum") * 5 >= col("total") * 4)
        .agg(min(col("rk")).cast("int").as("users_for_80pct"),
          max(col("total")).as("n_events"),
          max(col("n_users")).as("n_users"))
        .select(col("n_users"), col("n_events"), col("users_for_80pct"),
          round6(col("users_for_80pct") / col("n_users")).as("user_share"))
    }),

    // DAU / WAU / MAU — the rolling-distinct-actives triple every
    // product dashboard leads with. Distinct (user, day) reduces the
    // corpus once; each calendar day then joins the activity rows inside
    // its trailing 1/7/30-day band (a 30-row broadcast of days against
    // the day-keyed activity table — never a per-event window, and
    // windows can't express a rolling DISTINCT anyway), and one
    // conditional distinct-count aggregate produces all three horizons.
    // Stickiness = DAU/MAU as an exact ratio.
    "events_active_users_rolling" -> ((s, dir) => {
      val act = events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
        .localCheckpoint()
      val days = act.select(col("d").as("day")).distinct()
      act.join(broadcast(days),
          datediff(col("day"), col("d")).between(0, 29))
        .groupBy(col("day"))
        .agg(
          count_distinct(when(datediff(col("day"), col("d")) === 0,
            col("user_id"))).as("dau"),
          count_distinct(when(datediff(col("day"), col("d")) <= 6,
            col("user_id"))).as("wau"),
          count_distinct(col("user_id")).as("mau"))
        .select(col("day").cast("timestamp").as("day"),
          col("dau"), col("wau"), col("mau"),
          round6(col("dau") / col("mau")).as("stickiness"))
        .orderBy(col("day"))
    }),

    // The full cohort-retention TRIANGLE (the d1/d7 spot checks above,
    // generalized): distinct active users per (first-seen cohort day,
    // day offset 0..7), with the retention rate as an exact ratio
    // against the cohort size (= the offset-0 cell, so the matrix is
    // self-normalizing). One distinct (user, day) pass, a per-user min,
    // one join back — the same shapes events_retention already pays,
    // just kept at matrix grain instead of two hand-picked offsets.
    "events_retention_matrix" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
      val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
      val cells = first.join(ev, "user_id")
        .withColumn("day_offset", datediff(col("d"), col("d0")))
        .filter(col("day_offset") <= 7)
        .groupBy(col("d0"), col("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_active"))
      val cohorts = cells.filter(col("day_offset") === 0)
        .select(col("d0"), col("n_active").as("n_cohort"))
      cells.join(broadcast(cohorts), "d0")
        .select(col("d0").cast("timestamp").as("cohort_day"),
          col("day_offset"), col("n_active"),
          round6(col("n_active") / col("n_cohort")).as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    "events_retention" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("ts").cast("date").as("d"))
      val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
      val activity = ev.distinct()
      first.join(activity, "user_id")
        .groupBy(col("d0"))
        .agg(count_distinct(col("user_id")).as("n_cohort"),
          count_distinct(when(col("d") === date_add(col("d0"), 1), col("user_id")))
            .as("d1_retained"),
          count_distinct(when(col("d") === date_add(col("d0"), 7), col("user_id")))
            .as("d7_retained"))
        // DATE surfaces as python date objects via parquet->pandas but
        // datetime64 via DuckDB — emit as timestamp so dtypes agree
        .select(col("d0").cast("timestamp").as("cohort_day"),
          col("n_cohort"), col("d1_retained"), col("d7_retained"))
        .orderBy(col("cohort_day"))
    }),

    // Navigation window functions: lag/lead/ntile over each user's event
    // history — the per-entity sequence features (time-since-last,
    // next-event lookahead, activity quartile) a behavioral pipeline
    // derives. One shuffle on user_id shared by all three functions
    // (same window spec => same Exchange).
    "events_user_lag" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .filter(col("user_id") < 20)
        .select(col("event_id"), col("user_id"), col("ts"),
          (unix_timestamp(col("ts")) -
            unix_timestamp(lag(col("ts"), 1).over(w))).as("secs_since_prev"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"),
          lead(col("event_id"), 1).over(w).as("next_event_id"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("event_id"))
    }),

    // Pivot: per-user event-type counts as columns. The value list is
    // explicit (the 5 known event types), so Spark skips the extra
    // distinct-values job a blind pivot() would run — at 100 TB that
    // pre-pass is a full shuffle you never want implicitly.
    "events_pivot_user_type" -> ((s, dir) =>
      events(s, dir)
        .filter(col("user_id") < 50)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))),

    // Fixed-width value histogram per event type: pure map-side bucket
    // arithmetic + one partial-agg shuffle — the shape of every
    // distribution dashboard at any scale.
    "events_histogram" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"),
          floor(col("value") / 25.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("bucket"))),

    // Trailing-hour rolling aggregates per event (RANGE frame over epoch
    // seconds): each event sees the count/sum of its user's events in
    // (t-1h, t]. A RANGE frame is value-bounded, so ties and gaps are
    // handled identically on any engine; the state the engine keeps is
    // one sorted partition per user — same single user_id shuffle as
    // every other per-user window here. Epoch seconds are FLOORED on
    // both engines (Spark unix_timestamp truncates; the oracle spells
    // floor() — DuckDB's double->int cast rounds-to-nearest instead).
    "events_rolling_1h" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
        .rangeBetween(-3599, 0)
      events(s, dir)
        .filter(col("user_id") < 10)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .select(col("event_id"), col("user_id"), col("ts_sec"),
          count(lit(1)).over(w).as("n_trailing_1h"),
          sum(col("value").cast(DecimalType(18, 3))).over(w)
            .cast("double").as("sum_trailing_1h"))
        .orderBy(col("event_id"))
    }),

    // Lag-based sessionization: session index = running count of
    // gap-exceeded flags per user — the window-function route to the
    // same sessions session_window() builds (30-minute gap), here with
    // session bounds and sizes per (user, session). One user_id shuffle
    // shared by the lag and the running sum (same window spec).
    // Inter-arrival gap statistics per user — the latency/engagement
    // sequence feature a behavior model trains on. One user_id shuffle
    // reused by the lag window and the rollup; gaps are exact integer
    // seconds so every aggregate is order-independent without DECIMAL.
    "events_interarrival" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy("user_id").orderBy(col("ts_sec"), col("event_id"))
      val gap = col("ts_sec") - lag(col("ts_sec"), 1).over(wOrd)
      events(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .withColumn("gap_sec", gap)
        .filter(col("gap_sec").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_sec")).as("min_gap_sec"),
          max(col("gap_sec")).as("max_gap_sec"),
          round6(sum(col("gap_sec")).cast("double") / count(lit(1)))
            .as("avg_gap_sec"))
        .orderBy(col("user_id"))
    }),

    "events_sessionize_lag" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy("user_id").orderBy(col("ts_sec"), col("event_id"))
      val prevSec = lag(col("ts_sec"), 1).over(wOrd)
      val newSession = when(
        prevSec.isNull || col("ts_sec") - prevSec > 1800L, 1L).otherwise(0L)
      events(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .withColumn("sid",
          sum(newSession).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts_sec")).as("session_start_sec"),
          max(col("ts_sec")).as("session_last_sec"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("sid"))
    }),

    // Batch z-score anomaly detection — the oracle-checked batch form of
    // the streaming Welford detector (graft.streaming.EventStreams
    // .anomalies): per-user mean/std over `value`, count of events beyond
    // 3 sigma. One shuffle on user_id: the full-partition window computes
    // the moments, and the per-user rollup reuses the same hash
    // partitioning (no second exchange). Moments come from exact DECIMAL
    // sums (sum and sum-of-squares of the double `value` are
    // order-dependent in IEEE arithmetic; DECIMAL accumulation is not),
    // converted to double only for the final mean/std arithmetic, which
    // both engines evaluate in identical shapes.
    "events_anomaly_zscore" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
      val vDec = col("value").cast(DecimalType(18, 3))
      val withMoments = events(s, dir)
        // one select => one Window operator evaluating all three moment
        // functions in a single pass (three withColumns plan three)
        .select(col("user_id"), col("value"),
          count(lit(1)).over(w).as("n"),
          sum(vDec).over(w).cast("double").as("s1"),
          sum(vDec * vDec).over(w).cast("double").as("s2"))
        .withColumn("mean", col("s1") / col("n"))
        .withColumn("std",
          sqrt(greatest(col("s2") / col("n") - col("mean") * col("mean"), lit(0.0))))
      withMoments.groupBy(col("user_id"))
        .agg(max(col("n")).as("n_events"),
          round6(max(col("mean"))).as("mean_value"),
          round6(max(col("std"))).as("std_value"),
          sum(when(abs(col("value") - col("mean")) > lit(3.0) * col("std"), 1L)
            .otherwise(0L)).as("n_anomalies"))
        .orderBy(col("user_id"))
    }),

    // Schemaless metadata: extract props.k (arbitrary JSON, the analog of
    // the reference's additional_metadata JSON, MerkonMemoryStore.cs:232).
    "events_json_props" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("k_sum"), count(col("k")).as("n_with_k"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // Unpivot (melt): the inverse of events_pivot_user_type — wide
    // per-type count columns back to (user_id, event_type, n) rows via
    // the native unpivot operator (a generate, no shuffle of its own;
    // the only exchange is the pivot's groupBy). Absent combinations
    // stay NULL through the round-trip and are dropped, so the result
    // is exactly the plain long-format GROUP BY the oracle runs.
    "events_unpivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      events(s, dir)
        .filter(col("user_id") < 50)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
        .filter(col("n").isNotNull)
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Gap-and-islands: runs of consecutive active DAYS per user. The
    // classic anchor trick — day minus row_number is constant within a
    // consecutive run — turns island detection into plain grouping:
    // one user_id shuffle for the window, one partial-agg for the
    // islands, one for the per-user rollup. No iteration, no state.
    "events_gap_islands" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val days = events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val islands = days
        .withColumn("anchor",
          date_sub(col("day"), row_number().over(w)))
        .groupBy(col("user_id"), col("anchor"))
        .agg(count(lit(1)).as("len"))
      islands.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          max(col("len")).as("max_run_days"),
          sum(col("len")).as("active_days"))
        .orderBy(col("user_id"))
    }),

    // SCD2 dimension build: compact each user's stream of props.k values
    // into slowly-changing-dimension rows — a row per VALUE RUN with
    // [valid_from, valid_to) bounds and a current flag. Change detection
    // is a null-safe lag compare, closing bounds is a lead — both over
    // the same (user, ts, event_id) window, so the whole history build
    // is one user_id shuffle however long the history. The standard
    // warehouse pattern for turning CDC/event streams into dimensions.
    "events_scd2_build" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val keyed = events(s, dir)
        .filter(col("user_id") < 30)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k").isNotNull)
      val changes = keyed
        .withColumn("prev_k", lag(col("k"), 1).over(w))
        .filter(!(col("k") <=> col("prev_k")))
      val w2 = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      changes
        .withColumn("valid_to", lead(col("ts"), 1).over(w2))
        .select(col("user_id"), col("k"), col("ts").as("valid_from"),
          col("valid_to"), col("valid_to").isNull.as("is_current"))
        .orderBy(col("user_id"), col("valid_from"))
    }),

    // Forward as-of join: each click paired with the user's NEXT
    // purchase (events_asof_error is the backward variant). A running
    // conditional min over the suffix frame — one user_id shuffle, no
    // self-join, no per-row subquery; the (ts, event_id) ordering makes
    // intra-tie behavior identical on both engines. Gap is exact
    // integer microseconds, so no float drift.
    "events_asof_forward" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      events(s, dir)
        .withColumn("next_purchase_ts",
          min(when(col("event_type") === "purchase", col("ts"))).over(w))
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("next_purchase_ts"),
          (unix_micros(col("next_purchase_ts")) - unix_micros(col("ts")))
            .as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // Exponential smoothing over a bounded trailing frame: per-user EWMA
    // (alpha = 0.2) of the last 20 events. The recursion s_t = 0.8*s_{t-1}
    // + 0.2*x_t is a sequential LEFT FOLD over the frame — expressed as
    // collect_list over a ROWS window + the aggregate() HOF seeded with
    // the frame's first element, the exact IEEE op sequence DuckDB's
    // list_reduce performs, so values are bit-identical. The frame bound
    // (20 rows) keeps per-row work O(1); an unbounded recursive EWMA is
    // not window-expressible without exponent-scaled cumsums that
    // overflow on long series — the bounded frame IS the scale answer
    // (weights below 0.8^20 ~ 0.012 are noise anyway).
    "events_ewma" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-19, Window.currentRow)
      events(s, dir)
        .filter(col("user_id") < 20)
        .withColumn("vals", collect_list(col("value")).over(w))
        .select(col("event_id"), col("user_id"), col("ts"),
          round6(aggregate(
            slice(col("vals"), lit(2), size(col("vals")) - 1),
            element_at(col("vals"), 1),
            (acc, x) => acc * lit(0.8) + x * lit(0.2))).as("ewma20"))
        .orderBy(col("event_id"))
    }),

    // CUSUM changepoint detection (Page 1954) — the mean-shift companion
    // to the z-score / MAD outlier detectors: those flag single deviant
    // points, CUSUM localizes a SUSTAINED level shift. The textbook
    // statistic is recursive (S_k = max(0, S_{k-1} + dev_k)) and looks
    // un-expressible in window functions, but the drawdown identity
    // S_k = C_k - min_{0<=j<=k} C_j (C = plain cumsum of deviations,
    // C_0 = 0 — the empty prefix MUST be in the min, hence the
    // least(·, 0); proof by induction on k, pinned by CusumIdentitySpec)
    // turns it into TWO stock running windows — no
    // UDAF, no iteration, one shuffle. The reported row per series is
    // the statistic's peak: the maximum-likelihood changepoint location.
    //
    // Scale shape: one partitionBy(event_type) window sort serves both
    // running frames plus the peak argmax (same-keyed windows share one
    // exchange+sort). event_type is low-cardinality here; the production
    // form partitions by (series_id) — per-metric, per-tenant — where
    // cardinality, and thus parallelism, is high; nothing about the plan
    // changes. Determinism: deviations are round6'd doubles summed as
    // DECIMAL in a (ts, event_id)-pinned order; the running state is
    // exact DECIMAL on the Spark side, and the DuckDB oracle keeps the
    // drawdown barrier in DECIMAL via CASE (DuckDB's least() over mixed
    // DECIMAL widths binds as DOUBLE and would float-noise the stat —
    // and thus potentially the argmax row on near-tied series). The
    // baseline mean goes through the exact-DECIMAL sum and one IEEE
    // double division.
    "events_changepoint_cusum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir).select(col("event_type"), col("ts"),
        col("event_id"), round6(col("value")).as("v"))
      val stats = ev.groupBy(col("event_type"))
        .agg(sum(col("v").cast(DecimalType(27, 6))).as("sv"),
          count(lit(1)).as("n"))
        .select(col("event_type"),
          round6(col("sv").cast("double") / col("n")).as("mu"), col("n"))
      val seq = Window.partitionBy("event_type")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = ev.join(broadcast(stats), "event_type")
        .withColumn("dev",
          round6(col("v") - col("mu")).cast(DecimalType(27, 6)))
        .withColumn("cusum", sum(col("dev")).over(seq))
        .withColumn("stat", col("cusum") -
          least(min(col("cusum")).over(seq),
            lit(0).cast(DecimalType(27, 6))))
      val byPeak = Window.partitionBy("event_type")
        .orderBy(col("stat").desc, col("ts"), col("event_id"))
      cum.withColumn("rk", row_number().over(byPeak))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("ts").as("cp_ts"),
          col("event_id").as("cp_event_id"),
          col("stat").cast("double").as("cusum_peak"),
          col("mu").as("mean_value"), col("n").as("n_events"))
        .orderBy(col("event_type"))
    }),

    // Last-touch attribution: each purchase credits the user's most
    // recent PRIOR non-purchase event within a 3-day lookback, else
    // "(direct)"; rollup = purchases and mean click-to-buy gap per
    // attributing channel. One user_id shuffle serves both IGNORE-NULLS
    // last_value windows (same frame); the rollup reduces to 6 rows.
    // Gap seconds are exact BIGINTs summed before one final division,
    // so the mean is partitioning-independent.
    "events_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val attributed = events(s, dir)
        .withColumn("attr_ts",
          last(when(col("event_type") =!= "purchase", col("ts")),
            ignoreNulls = true).over(w))
        .withColumn("attr_type",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("gap_sec",
          unix_timestamp(col("ts")) - unix_timestamp(col("attr_ts")))
        .withColumn("channel",
          when(col("attr_ts").isNotNull && col("gap_sec") <= 3L * 24 * 3600,
            col("attr_type")).otherwise(lit("(direct)")))
      attributed
        .withColumn("attr_gap",
          when(col("channel") =!= "(direct)", col("gap_sec")))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          round6(sum(col("attr_gap")).cast("double") /
            nullif(count(col("attr_gap")), lit(0))).as("avg_gap_sec"))
        .orderBy(col("channel"))
    }),

    // Top-k user-journey paths (sequence mining): the 3-step event-type
    // trigrams users actually walk, ranked by frequency — the "common
    // funnels discovery" pass that precedes a hand-written events_funnel.
    // One user_id shuffle serves both lead() windows (same frame); the
    // trigram extraction is map-side after it, and the global count
    // reduces through a partial agg before TakeOrderedAndProject. Per-row
    // state is O(1) (two leads), per-user cost is linear in that user's
    // events — no sequence blow-up, no collect_list of whole histories.
    // Ordering is total per user — (ts, event_id) — and rows that tie on
    // ts are still uniquely ordered by event_id, so the event_type
    // sequence both engines see is identical.
    "events_path_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat(col("event_type"), lit(">"), col("e2"), lit(">"),
          col("e3")).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(20)
    }),

    // Robust outliers via median + MAD (median absolute deviation): the
    // heavy-tail-safe alternative to events_anomaly_zscore (a single
    // extreme value drags a mean/std z-score; it cannot move a median).
    // Medians are computed by the RANK construction — row_number over
    // (value, event_id), pick positions (n+1) div 2 and n div 2 + 1,
    // average them — spelled identically on both engines, because
    // percentile_cont interpolation is engine-specific at the ulp level
    // while the rank formula is exact. Cost: two window sorts partitioned
    // on the 5-key event_type column + two 5-row broadcast joins back.
    // At 100 TB the same shape holds while the grouping key stays
    // bounded (per-group sort is spillable); for unbounded keys or a
    // single pass the GK sketch (events_value_quantiles_approx) is the
    // companion — this exact form is the one the oracle can hash-check.
    "events_mad_outliers" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.DataFrame
      val ev = events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
      def rankMedian(df: DataFrame, v: String, out: String): DataFrame = {
        val w = Window.partitionBy("event_type").orderBy(col(v), col("event_id"))
        val all = Window.partitionBy("event_type")
        df.select(col("event_type"), col(v),
            row_number().over(w).as("rn"), count(lit(1)).over(all).as("n"))
          .filter(col("rn") === expr("(n + 1) div 2") ||
            col("rn") === expr("n div 2 + 1"))
          .groupBy(col("event_type")).agg(avg(col(v)).as(out))
      }
      val med = rankMedian(ev, "value", "med")
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = rankMedian(
        dev.select(col("event_id"), col("event_type"), col("dev")), "dev", "mad")
      dev.join(broadcast(mad), "event_type")
        .filter(col("mad") > 0)
        .withColumn("z", lit(0.6745) * (col("value") - col("med")) / col("mad"))
        .filter(abs(col("z")) > 3.5)
        .select(col("event_id"), col("event_type"), col("value"),
          round6(col("med")).as("med"), round6(col("mad")).as("mad"),
          round6(col("z")).as("robust_z"))
        .orderBy(col("event_id"))
    }),

    // Hour-of-day seasonal decomposition: the per-(type, hour) load
    // profile and its ratio to the type's overall mean — the seasonality
    // pass that precedes any time-series anomaly baseline. One partial-agg
    // shuffle builds the 120-row hourly profile; the type totals re-reduce
    // THAT profile (never a second scan) and broadcast back. Sums go
    // through exact DECIMAL so the double conversion happens once per
    // group, not once per task-completion order.
    // Seasonal-adjusted anomaly detection (STL-lite): a 9-to-5 workload
    // makes every evening look anomalous to a raw z-score, so the MAD
    // robust-z runs on RESIDUALS against the (type, hour) seasonal
    // baseline — the deseasonalize-then-detect composition
    // events_seasonal_hourly and events_mad_outliers each do half of.
    // The baseline is an exact DECIMAL ratio (24×types rows, broadcast
    // back), residual medians use the same rank-median (exact avg of the
    // two central values), and the final robust-z is one broadcast join
    // — three passes total, no window over raw rows except the per-type
    // rank which every exact median intrinsically needs.
    "events_seasonal_residual_outliers" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.DataFrame
      val ev = events(s, dir).select(col("event_id"), col("event_type"),
        hour(col("ts")).as("hr"), col("value"))
      val hourly = ev
        .withColumn("v", col("value").cast(DecimalType(18, 3)))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .select(col("event_type"), col("hr"),
          (col("sv").cast("double") / col("n")).as("hour_avg"))
      val resid = ev.join(broadcast(hourly), Seq("event_type", "hr"))
        .withColumn("resid", col("value") - col("hour_avg"))
      def rankMedian(df: DataFrame, v: String, out: String): DataFrame = {
        val w = Window.partitionBy("event_type").orderBy(col(v), col("event_id"))
        val all = Window.partitionBy("event_type")
        df.select(col("event_type"), col(v),
            row_number().over(w).as("rn"), count(lit(1)).over(all).as("n"))
          .filter(col("rn") === expr("(n + 1) div 2") ||
            col("rn") === expr("n div 2 + 1"))
          .groupBy(col("event_type")).agg(avg(col(v)).as(out))
      }
      val med = rankMedian(
        resid.select(col("event_id"), col("event_type"), col("resid")),
        "resid", "med")
      val dev = resid.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("resid") - col("med")))
      val mad = rankMedian(
        dev.select(col("event_id"), col("event_type"), col("dev")), "dev", "mad")
      dev.join(broadcast(mad), "event_type")
        .filter(col("mad") > 0)
        .withColumn("z", lit(0.6745) * (col("resid") - col("med")) / col("mad"))
        .filter(abs(col("z")) > 3.5)
        .select(col("event_id"), col("event_type"), col("hr"), col("value"),
          round6(col("resid")).as("resid"), round6(col("z")).as("robust_z"))
        .orderBy(col("event_id"))
    }),

    "events_seasonal_hourly" -> ((s, dir) => {
      val hourly = events(s, dir)
        .select(col("event_type"), hour(col("ts")).as("hr"),
          col("value").cast(DecimalType(18, 3)).as("v"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val totals = hourly.groupBy(col("event_type"))
        .agg(sum(col("n")).as("tn"), sum(col("sv")).as("tsv"))
      hourly.join(broadcast(totals), "event_type")
        .withColumn("hour_avg", col("sv").cast("double") / col("n"))
        .withColumn("type_avg", col("tsv").cast("double") / col("tn"))
        .select(col("event_type"), col("hr"), col("n"),
          round6(col("hour_avg")).as("hour_avg"),
          round6(col("type_avg")).as("type_avg"),
          // null ratio when the type mean is exactly 0 (NULLIF in the
          // oracle): Spark would emit NaN/Infinity here while DuckDB's
          // behavior is setting-dependent — a latent cross-engine split
          round6(col("hour_avg") /
            when(col("type_avg") =!= 0, col("type_avg"))).as("seasonal_ratio"))
        .orderBy(col("event_type"), col("hr"))
    }),

    // Backward interval join: each purchase paired with the same user's
    // clicks in the PRECEDING 30 minutes — the attribution-window band,
    // the mirror of events_range_join's forward error→click band, and the
    // batch form of the stream-stream join shape in
    // [[graft.streaming.EventStreams.errorClickJoin]] (time bounded in
    // both directions, so streaming join state expires). Planned as an
    // equi-join on user_id with the time band as a post-join filter:
    // one shuffle each side, no pairwise blow-up beyond the per-user
    // band. The gap rides as exact BIGINT micros.
    "events_interval_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"), col("ts").as("c_ts"))
      purchases.join(clicks, Seq("user_id"))
        .filter(col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"))
        .select(col("user_id"), col("p_id"), col("c_id"), col("p_ts"), col("c_ts"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
        .orderBy(col("p_id"), col("c_id"))
    }),

    // Association-rule mining over per-user event baskets (the classic
    // market-basket support/confidence/lift, Agrawal & Srikant 1994):
    // basket = the distinct event types a user ever fired; a directed
    // rule ante→conseq scores co-occurrence against independence.
    // Scale shape: baskets are ONE distinct (partial-agg) shuffle on
    // (user, type); the pair build is a self equi-join on user_id whose
    // fan-out is bounded by per-user basket size — at most |event_types|²
    // pairs per user, with |event_types| a small fixed vocabulary, so it
    // never approaches O(N²) in users or events. Pair counts partial-agg
    // on (ante, conseq); the per-type totals and the user count are
    // vocabulary-sized / 1-row broadcasts. Lift stays in exact integer
    // arithmetic (n_both·n_users and n_ante·n_conseq) until one final
    // portable double division.
    "events_assoc_rules" -> ((s, dir) => {
      val baskets = events(s, dir)
        .select(col("user_id"), col("event_type")).distinct()
        .localCheckpoint()
      val nUsers = baskets.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users"))
      val typeCounts = baskets.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_t"))
      val a = baskets.select(col("user_id"), col("event_type").as("ante"))
      val b = baskets.select(col("user_id"), col("event_type").as("conseq"))
      a.join(b, "user_id").filter(col("ante") =!= col("conseq"))
        .groupBy(col("ante"), col("conseq")).agg(count(lit(1)).as("n_both"))
        .join(broadcast(typeCounts.select(col("event_type").as("ante"),
          col("n_t").as("n_ante"))), "ante")
        .join(broadcast(typeCounts.select(col("event_type").as("conseq"),
          col("n_t").as("n_conseq"))), "conseq")
        .crossJoin(broadcast(nUsers))
        .select(col("ante"), col("conseq"), col("n_both"), col("n_ante"),
          col("n_conseq"),
          round6(col("n_both").cast("double") / col("n_users")).as("support"),
          round6(col("n_both").cast("double") / col("n_ante")).as("confidence"),
          round6((col("n_both") * col("n_users")).cast("double") /
            (col("n_ante") * col("n_conseq")).cast("double")).as("lift"))
        .orderBy(col("ante"), col("conseq"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "events_mad_outliers" -> {
      val z = "0.6745 * (d.value - d.med) / a.mad"
      s"""WITH ev AS (SELECT event_id, event_type, value FROM events),
         |r1 AS (
         |  SELECT event_id, event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM ev),
         |med AS (
         |  SELECT event_type, avg(value) AS med FROM r1
         |  WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1 GROUP BY event_type),
         |dev AS (
         |  SELECT e.event_id, e.event_type, e.value, m.med,
         |    abs(e.value - m.med) AS dev
         |  FROM ev e JOIN med m USING (event_type)),
         |r2 AS (
         |  SELECT event_id, event_type, dev,
         |    row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM dev),
         |mad AS (
         |  SELECT event_type, avg(dev) AS mad FROM r2
         |  WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1 GROUP BY event_type)
         |SELECT d.event_id, d.event_type, d.value,
         |  ${graft.QueryPack.round6Sql("d.med")} AS med,
         |  ${graft.QueryPack.round6Sql("a.mad")} AS mad,
         |  ${graft.QueryPack.round6Sql(z)} AS robust_z
         |FROM dev d JOIN mad a USING (event_type)
         |WHERE a.mad > 0 AND abs($z) > 3.5
         |ORDER BY event_id""".stripMargin
    },
    "events_seasonal_residual_outliers" -> {
      val r6 = graft.QueryPack.round6Sql _
      val z = "0.6745 * (d.resid - d.med) / a.mad"
      s"""WITH ev AS (
         |  SELECT event_id, event_type, extract(hour FROM ts) AS hr, value
         |  FROM events),
         |hourly AS (
         |  SELECT event_type, hr,
         |    CAST(CAST(sum(CAST(value AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE)
         |      / count(*) AS hour_avg
         |  FROM ev GROUP BY 1, 2),
         |res AS (
         |  SELECT e.event_id, e.event_type, e.hr, e.value,
         |    e.value - h.hour_avg AS resid
         |  FROM ev e JOIN hourly h USING (event_type, hr)),
         |r1 AS (
         |  SELECT event_id, event_type, resid,
         |    row_number() OVER (PARTITION BY event_type ORDER BY resid, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM res),
         |med AS (
         |  SELECT event_type, avg(resid) AS med FROM r1
         |  WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1 GROUP BY event_type),
         |dev AS (
         |  SELECT r.event_id, r.event_type, r.hr, r.value, r.resid, m.med,
         |    abs(r.resid - m.med) AS dev
         |  FROM res r JOIN med m USING (event_type)),
         |r2 AS (
         |  SELECT event_id, event_type, dev,
         |    row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM dev),
         |mad AS (
         |  SELECT event_type, avg(dev) AS mad FROM r2
         |  WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1 GROUP BY event_type)
         |SELECT d.event_id, d.event_type, d.hr, d.value,
         |  ${r6("d.resid")} AS resid, ${r6(z)} AS robust_z
         |FROM dev d JOIN mad a USING (event_type)
         |WHERE a.mad > 0 AND abs($z) > 3.5
         |ORDER BY event_id""".stripMargin
    },
    "events_seasonal_hourly" ->
      s"""WITH hourly AS (
         |  SELECT event_type, extract(hour FROM ts) AS hr, count(*) AS n,
         |    sum(CAST(value AS DECIMAL(18,3))) AS sv
         |  FROM events GROUP BY 1, 2),
         |tot AS (
         |  SELECT event_type, CAST(sum(n) AS BIGINT) AS tn, sum(sv) AS tsv
         |  FROM hourly GROUP BY 1),
         |j AS (
         |  SELECT h.event_type, h.hr, h.n,
         |    CAST(CAST(h.sv AS VARCHAR) AS DOUBLE) / h.n AS hour_avg,
         |    CAST(CAST(t.tsv AS VARCHAR) AS DOUBLE) / t.tn AS type_avg
         |  FROM hourly h JOIN tot t USING (event_type))
         |SELECT event_type, hr, n,
         |  ${graft.QueryPack.round6Sql("hour_avg")} AS hour_avg,
         |  ${graft.QueryPack.round6Sql("type_avg")} AS type_avg,
         |  ${graft.QueryPack.round6Sql("hour_avg / NULLIF(type_avg, 0)")} AS seasonal_ratio
         |FROM j ORDER BY event_type, hr""".stripMargin,
    "events_interval_join" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS c_id, user_id, ts AS c_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p_id, c_id, p_ts, c_ts,
        |  epoch_us(p_ts) - epoch_us(c_ts) AS gap_us
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c_ts >= p_ts - INTERVAL 30 MINUTE AND c_ts <= p_ts
        |ORDER BY p_id, c_id""".stripMargin,
    "events_path_topk" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
        |FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "events_ewma" ->
      s"""WITH ew AS (
         |  SELECT event_id, user_id, ts,
         |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
         |  FROM events WHERE user_id < 20
         |)
         |SELECT event_id, user_id, ts,
         |  ${graft.QueryPack.round6Sql(
               "list_reduce(vals, (acc, x) -> acc * 0.8 + x * 0.2)")} AS ewma20
         |FROM ew ORDER BY event_id""".stripMargin,
    "events_changepoint_cusum" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH ev AS (
         |  SELECT event_type, ts, event_id, ${r6("value")} AS v FROM events
         |), st AS (
         |  SELECT event_type,
         |    ${r6("CAST(CAST(sum(CAST(v AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) / count(*)")} AS mu,
         |    count(*) AS n
         |  FROM ev GROUP BY event_type
         |), c1 AS (
         |  SELECT e.event_type, e.ts, e.event_id, st.mu, st.n,
         |    sum(CAST(${r6("e.v - st.mu")} AS DECIMAL(27,6))) OVER (
         |      PARTITION BY e.event_type ORDER BY e.ts, e.event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
         |  FROM ev e JOIN st USING (event_type)
         |), c2m AS (
         |  SELECT *, min(cusum) OVER (
         |      PARTITION BY event_type ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
         |  FROM c1
         |), c2 AS (
         |  -- CASE, not least(): DuckDB binds least(DECIMAL(38,6),
         |  -- DECIMAL(27,6)) as DOUBLE, which would float-noise the stat
         |  -- while the Spark side stays exact DECIMAL. CASE preserves
         |  -- DECIMAL(38,6), keeping both engines bit-exact.
         |  SELECT *, cusum - (CASE WHEN mn < 0 THEN mn
         |    ELSE CAST(0 AS DECIMAL(38,6)) END) AS stat
         |  FROM c2m
         |), pk AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY stat DESC, ts, event_id) AS rk
         |  FROM c2
         |)
         |SELECT event_type, ts AS cp_ts, event_id AS cp_event_id,
         |  CAST(CAST(stat AS VARCHAR) AS DOUBLE) AS cusum_peak,
         |  mu AS mean_value, n AS n_events
         |FROM pk WHERE rk = 1 ORDER BY event_type""".stripMargin
    },
    "events_attribution" ->
      s"""WITH attr AS (
         |  SELECT event_id, user_id, ts, event_type,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
         |      OVER w AS attr_ts,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
         |      OVER w AS attr_type
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |), purchases AS (
         |  SELECT *,
         |    epoch(date_trunc('second', ts)) -
         |      epoch(date_trunc('second', attr_ts)) AS gap_sec,
         |    CASE WHEN attr_ts IS NOT NULL AND
         |      epoch(date_trunc('second', ts)) -
         |        epoch(date_trunc('second', attr_ts)) <= 259200
         |      THEN attr_type ELSE '(direct)' END AS channel
         |  FROM attr WHERE event_type = 'purchase'
         |)
         |SELECT channel, count(*) AS n_purchases,
         |  ${graft.QueryPack.round6Sql(
               "CAST(sum(CASE WHEN channel <> '(direct)' THEN gap_sec END) AS DOUBLE) / " +
               "nullif(count(CASE WHEN channel <> '(direct)' THEN gap_sec END), 0)")}
         |    AS avg_gap_sec
         |FROM purchases GROUP BY channel ORDER BY channel""".stripMargin,
    "events_unpivot" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events WHERE user_id < 50
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "events_gap_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), anch AS (
        |  SELECT user_id,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
        |      AS anchor
        |  FROM days
        |), islands AS (
        |  SELECT user_id, anchor, count(*) AS len
        |  FROM anch GROUP BY user_id, anchor
        |)
        |SELECT user_id, count(*) AS n_islands, max(len) AS max_run_days,
        |  CAST(sum(len) AS BIGINT) AS active_days
        |FROM islands GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_scd2_build" ->
      """WITH keyed AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE user_id < 30
        |), nn AS (
        |  SELECT * FROM keyed WHERE k IS NOT NULL
        |), changes AS (
        |  SELECT user_id, event_id, ts, k,
        |    lag(k, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_k
        |  FROM nn
        |  QUALIFY k IS DISTINCT FROM prev_k
        |)
        |SELECT user_id, k, ts AS valid_from,
        |  lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    AS is_current
        |FROM changes
        |ORDER BY user_id, valid_from""".stripMargin,
    "events_asof_forward" ->
      """WITH nxt AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_ts
        |  FROM events
        |)
        |SELECT event_id, user_id, ts, next_purchase_ts,
        |  epoch_us(next_purchase_ts) - epoch_us(ts) AS gap_us
        |FROM nxt WHERE event_type = 'click'
        |ORDER BY event_id""".stripMargin,
    "events_histogram" ->
      """SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM events GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,
    "events_rolling_1h" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value,
        |    CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_sec
        |  FROM events WHERE user_id < 10
        |)
        |SELECT event_id, user_id, ts_sec,
        |  count(*) OVER w AS n_trailing_1h,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,3))) OVER w AS VARCHAR) AS DOUBLE)
        |    AS sum_trailing_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
        |  RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "events_interarrival" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id,
         |    CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_sec
         |  FROM events
         |), gaps AS (
         |  SELECT user_id,
         |    ts_sec - lag(ts_sec) OVER (PARTITION BY user_id
         |      ORDER BY ts_sec, event_id) AS gap_sec
         |  FROM e
         |)
         |SELECT user_id, count(*) AS n_gaps,
         |  min(gap_sec) AS min_gap_sec, max(gap_sec) AS max_gap_sec,
         |  ${graft.QueryPack.round6Sql(
            "CAST(CAST(sum(gap_sec) AS BIGINT) AS DOUBLE) / count(*)")} AS avg_gap_sec
         |FROM gaps WHERE gap_sec IS NOT NULL
         |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_sessionize_lag" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_sec
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, ts_sec, event_id,
        |    CASE WHEN lag(ts_sec) OVER w IS NULL
        |           OR ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
        |), sessions AS (
        |  SELECT user_id, ts_sec,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, CAST(sid AS BIGINT) AS sid,
        |  min(ts_sec) AS session_start_sec, max(ts_sec) AS session_last_sec,
        |  count(*) AS n
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, sid""".stripMargin,
    "events_anomaly_zscore" ->
      """WITH w AS (
        |  SELECT user_id, value,
        |    count(*) OVER (PARTITION BY user_id) AS n,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(18,3)))
        |      OVER (PARTITION BY user_id) AS VARCHAR) AS DOUBLE) AS s1,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(18,3)) * CAST(value AS DECIMAL(18,3)))
        |      OVER (PARTITION BY user_id) AS VARCHAR) AS DOUBLE) AS s2
        |  FROM events
        |), m AS (
        |  SELECT user_id, value, n, s1 / n AS mean,
        |    sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS std
        |  FROM w
        |)
        |SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
        |  floor(max(mean) * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
        |  floor(max(std) * 1000000.0 + 0.5) / 1000000.0 AS std_value,
        |  CAST(sum(CASE WHEN abs(value - mean) > 3.0 * std THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anomalies
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_tumbling_1h" ->
      """SELECT date_trunc('hour', ts) AS w_start, event_type,
        |  count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_windowed_topk" ->
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS w_start, user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT w_start, user_id, n,
        |    row_number() OVER (PARTITION BY w_start
        |                       ORDER BY n DESC, user_id) AS rank
        |  FROM c
        |)
        |SELECT w_start, CAST(rank AS INTEGER) AS rank, user_id,
        |  CAST(n AS BIGINT) AS n_events
        |FROM r WHERE rank <= 3 ORDER BY w_start, rank""".stripMargin,
    "events_sliding_1h_30m" ->
      """WITH b AS (
        |  SELECT ts, date_trunc('hour', ts)
        |    + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
        |           ELSE INTERVAL 0 MINUTE END AS bucket
        |  FROM events
        |), cand AS (
        |  SELECT ts, unnest([bucket, bucket - INTERVAL 30 MINUTE]) AS w_start FROM b
        |)
        |SELECT w_start, count(*) AS n FROM cand
        |WHERE ts >= w_start AND ts < w_start + INTERVAL 1 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_session_2h" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 2 HOUR THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
        |  count(*) AS n
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "events_asof_error" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        |), errors AS (
        |  SELECT event_id AS err_id, user_id, ts AS err_ts
        |  FROM events WHERE event_type = 'error'
        |)
        |SELECT c.event_id, c.user_id, c.ts, e.err_id, e.err_ts
        |FROM clicks c ASOF LEFT JOIN errors e
        |  ON c.user_id = e.user_id AND c.ts >= e.err_ts
        |ORDER BY c.event_id""".stripMargin,
    "events_range_join" ->
      """WITH errors AS (
        |  SELECT event_id AS err_id, user_id, ts AS err_ts
        |  FROM events WHERE event_type = 'error'
        |), clicks AS (
        |  SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT e.err_id, c.click_id, e.user_id, e.err_ts, c.click_ts
        |FROM errors e JOIN clicks c
        |  ON e.user_id = c.user_id
        | AND c.click_ts > e.err_ts
        | AND c.click_ts <= e.err_ts + INTERVAL 600 SECOND
        |ORDER BY err_id, click_id""".stripMargin,
    "events_lateness_profile" ->
      """WITH e AS (
        |  SELECT event_id // 1000 AS bucket, epoch_us(ts) AS us, event_type
        |  FROM events
        |), bm AS (
        |  SELECT bucket, max(us) AS bmax FROM e GROUP BY bucket
        |), pr AS (
        |  SELECT bucket, max(bmax) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
        |  FROM bm
        |), l AS (
        |  SELECT e.event_type,
        |    greatest(0, coalesce(pr.prior_max - e.us, 0)) AS late_us
        |  FROM e JOIN pr USING (bucket)
        |)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1m,
        |  CAST(sum(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_10m,
        |  max(late_us) AS max_late_us
        |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_range_join_outer" ->
      """WITH errors AS (
        |  SELECT event_id AS err_id, user_id, ts AS err_ts
        |  FROM events WHERE event_type = 'error'
        |), clicks AS (
        |  SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT e.err_id, c.click_id, e.user_id, e.err_ts, c.click_ts
        |FROM errors e LEFT JOIN clicks c
        |  ON e.user_id = c.user_id
        | AND c.click_ts > e.err_ts
        | AND c.click_ts <= e.err_ts + INTERVAL 600 SECOND
        |ORDER BY err_id, click_id""".stripMargin,
    "events_value_quantiles" -> {
      def q(p: String, name: String) =
        s"${graft.QueryPack.round6Sql(s"quantile_cont(value, $p)")} AS $name"
      s"""SELECT event_type, ${q("0.5", "p50")}, ${q("0.9", "p90")}, ${q("0.99", "p99")}
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    },
    "events_pareto_concentration" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH uc AS (
         |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
         |), cum AS (
         |  SELECT user_id, n,
         |    row_number() OVER (ORDER BY n DESC, user_id) AS rk,
         |    sum(n) OVER (ORDER BY n DESC, user_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM uc
         |), tot AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_users FROM uc
         |)
         |SELECT t.n_users, t.total AS n_events,
         |  CAST(min(c.rk) AS INTEGER) AS users_for_80pct,
         |  ${r6("min(c.rk) / t.n_users")} AS user_share
         |FROM cum c, tot t
         |WHERE c.cum * 5 >= t.total * 4
         |GROUP BY t.n_users, t.total""".stripMargin
    },
    "events_active_users_rolling" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH a AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
         |), days AS (
         |  SELECT DISTINCT d AS day FROM a
         |), j AS (
         |  SELECT days.day, a.user_id, days.day - a.d AS age
         |  FROM days JOIN a ON a.d <= days.day AND a.d >= days.day - 29
         |)
         |SELECT CAST(day AS TIMESTAMP) AS day,
         |  count(DISTINCT CASE WHEN age = 0 THEN user_id END) AS dau,
         |  count(DISTINCT CASE WHEN age <= 6 THEN user_id END) AS wau,
         |  count(DISTINCT user_id) AS mau,
         |  ${r6("count(DISTINCT CASE WHEN age = 0 THEN user_id END) " +
            "/ count(DISTINCT user_id)")} AS stickiness
         |FROM j GROUP BY day ORDER BY day""".stripMargin
    },
    "events_retention_matrix" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH a AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
         |), f AS (
         |  SELECT user_id, min(d) AS d0 FROM a GROUP BY user_id
         |), cells AS (
         |  SELECT f.d0, a.d - f.d0 AS day_offset,
         |    count(DISTINCT a.user_id) AS n_active
         |  FROM f JOIN a USING (user_id)
         |  WHERE a.d - f.d0 <= 7
         |  GROUP BY f.d0, a.d - f.d0
         |), cohorts AS (
         |  SELECT d0, n_active AS n_cohort FROM cells WHERE day_offset = 0
         |)
         |SELECT CAST(c.d0 AS TIMESTAMP) AS cohort_day,
         |  CAST(c.day_offset AS INTEGER) AS day_offset, c.n_active,
         |  ${r6("c.n_active / h.n_cohort")} AS retention
         |FROM cells c JOIN cohorts h USING (d0)
         |ORDER BY cohort_day, day_offset""".stripMargin
    },
    "events_retention" ->
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
        |), a AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        |)
        |SELECT CAST(d0 AS TIMESTAMP) AS cohort_day,
        |  count(DISTINCT f.user_id) AS n_cohort,
        |  count(DISTINCT CASE WHEN a.d = d0 + 1 THEN a.user_id END) AS d1_retained,
        |  count(DISTINCT CASE WHEN a.d = d0 + 7 THEN a.user_id END) AS d7_retained
        |FROM f JOIN a ON f.user_id = a.user_id
        |GROUP BY d0 ORDER BY cohort_day""".stripMargin,
    "events_funnel" ->
      """WITH su AS (
        |  SELECT user_id, min(ts) AS s_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), cl AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |  JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'click' AND e.ts > su.s_ts
        |  GROUP BY e.user_id
        |), pu AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |  JOIN cl ON e.user_id = cl.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > cl.c_ts
        |  GROUP BY e.user_id
        |)
        |SELECT (SELECT count(*) FROM su) AS n_signup,
        |       (SELECT count(*) FROM cl) AS n_click_after_signup,
        |       (SELECT count(*) FROM pu) AS n_purchase_after_click""".stripMargin,
    "events_peak_concurrency" ->
      """WITH b AS (
        |  SELECT event_type, ts AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT event_type, ts + INTERVAL 30 MINUTE, -1 FROM events
        |), l AS (
        |  SELECT event_type, t,
        |    sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
        |  FROM b
        |), p AS (
        |  SELECT event_type, CAST(max(live) AS BIGINT) AS peak
        |  FROM l GROUP BY event_type
        |)
        |SELECT l.event_type, p.peak, min(l.t) AS peak_at
        |FROM l JOIN p ON l.event_type = p.event_type AND l.live = p.peak
        |GROUP BY l.event_type, p.peak
        |ORDER BY l.event_type""".stripMargin,
    // the sharded sweep must equal the GLOBAL sweep exactly — its oracle
    // IS the global spelling (shard + carry-stitch == global, hash-proven)
    "events_peak_concurrency_sharded" ->
      """WITH b AS (
        |  SELECT event_type, ts AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT event_type, ts + INTERVAL 30 MINUTE, -1 FROM events
        |), l AS (
        |  SELECT event_type, t,
        |    sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
        |  FROM b
        |), p AS (
        |  SELECT event_type, CAST(max(live) AS BIGINT) AS peak
        |  FROM l GROUP BY event_type
        |)
        |SELECT l.event_type, p.peak, min(l.t) AS peak_at
        |FROM l JOIN p ON l.event_type = p.event_type AND l.live = p.peak
        |GROUP BY l.event_type, p.peak
        |ORDER BY l.event_type""".stripMargin,
    "events_interval_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, event_id,
        |    epoch(date_trunc('second', ts)) AS s,
        |    epoch(date_trunc('second', ts)) + 1800 AS e
        |  FROM events
        |), m AS (
        |  SELECT user_id, event_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
        |  FROM iv
        |), isl AS (
        |  SELECT user_id, s, e,
        |    sum(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s, e, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m
        |), g AS (
        |  SELECT user_id, island, min(s) AS is_s, max(e) AS is_e
        |  FROM isl GROUP BY user_id, island
        |)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(is_e - is_s) AS BIGINT) AS covered_sec
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_markov_transitions" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH tr AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type, 1) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS to_type
         |  FROM events
         |), cnt AS (
         |  SELECT from_type, to_type, count(*) AS n
         |  FROM tr WHERE to_type IS NOT NULL
         |  GROUP BY from_type, to_type
         |), outs AS (
         |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_out
         |  FROM cnt GROUP BY from_type
         |)
         |SELECT c.from_type, c.to_type, c.n, ${r6("c.n / o.n_out")} AS p
         |FROM cnt c JOIN outs o USING (from_type)
         |ORDER BY from_type, to_type""".stripMargin
    },
    "events_funnel_windowed" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH su AS (
         |  SELECT user_id, min(ts) AS s_ts FROM events
         |  WHERE event_type = 'signup' GROUP BY user_id
         |), cl AS (
         |  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
         |  JOIN su ON e.user_id = su.user_id
         |  WHERE e.event_type = 'click' AND e.ts > su.s_ts
         |    AND e.ts <= su.s_ts + INTERVAL 72 HOUR
         |  GROUP BY e.user_id
         |), pu AS (
         |  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
         |  JOIN cl ON e.user_id = cl.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts > cl.c_ts
         |    AND e.ts <= cl.c_ts + INTERVAL 72 HOUR
         |  GROUP BY e.user_id
         |), c AS (
         |  SELECT (SELECT count(*) FROM su) AS n_signup,
         |         (SELECT count(*) FROM cl) AS n_click_72h,
         |         (SELECT count(*) FROM pu) AS n_purchase_72h
         |)
         |SELECT n_signup, n_click_72h, n_purchase_72h,
         |  ${r6("n_click_72h / n_signup")} AS click_rate,
         |  ${r6("n_purchase_72h / n_click_72h")} AS purchase_rate
         |FROM c""".stripMargin
    },
    "events_user_lag" ->
      """SELECT event_id, user_id, ts,
        |  CAST(epoch(date_trunc('second', ts)) -
        |    epoch(date_trunc('second', lag(ts, 1) OVER w)) AS BIGINT) AS secs_since_prev,
        |  lag(event_id, 1) OVER w AS prev_event_id,
        |  lead(event_id, 1) OVER w AS next_event_id,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "events_pivot_user_type" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events WHERE user_id < 50
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_json_props" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_assoc_rules" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH baskets AS (
         |  SELECT DISTINCT user_id, event_type FROM events
         |), tot AS (SELECT count(DISTINCT user_id) AS n_users FROM baskets),
         |tc AS (SELECT event_type, count(*) AS n_t FROM baskets GROUP BY 1),
         |pairs AS (
         |  SELECT a.event_type AS ante, b.event_type AS conseq,
         |    count(*) AS n_both
         |  FROM baskets a JOIN baskets b USING (user_id)
         |  WHERE a.event_type <> b.event_type
         |  GROUP BY 1, 2
         |)
         |SELECT p.ante, p.conseq, p.n_both,
         |  ta.n_t AS n_ante, tb.n_t AS n_conseq,
         |  ${r6("CAST(p.n_both AS DOUBLE) / t.n_users")} AS support,
         |  ${r6("CAST(p.n_both AS DOUBLE) / ta.n_t")} AS confidence,
         |  ${r6("CAST(p.n_both * t.n_users AS DOUBLE) / CAST(ta.n_t * tb.n_t AS DOUBLE)")} AS lift
         |FROM pairs p
         |JOIN tc ta ON ta.event_type = p.ante
         |JOIN tc tb ON tb.event_type = p.conseq
         |CROSS JOIN tot t
         |ORDER BY ante, conseq""".stripMargin
    }
  )
}

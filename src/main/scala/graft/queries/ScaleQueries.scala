package graft.queries

import graft.QueryPack
import org.apache.spark.sql.functions._

/**
 * Scale-pattern operators: the shapes that keep 100 TB jobs alive under
 * skew and cardinality pressure.
 *
 *  - `events_salted_user_counts`: the two-phase salted aggregation. A
 *    single hot key floods one reducer in a naive groupBy; salting
 *    splits each key into `Salt` sub-groups aggregated in parallel, then
 *    a cheap second aggregation over at most `Salt` rows per key merges
 *    them. Result is bit-identical to the naive plan (count/sum are
 *    reassociable), so the DuckDB oracle is the plain GROUP BY — the
 *    pattern is verified, not just demonstrated. The salt is
 *    deterministic (hash of event_id) so runs are reproducible.
 *  - `events_distinct_users_exact`: exact distinct counts, fully
 *    oracle-checked (one expand-free distinct aggregation);
 *  - `events_distinct_users_approx`: the HyperLogLog++ sketch variant
 *    (approx_count_distinct, the 100 TB path — fixed-size sketch state
 *    instead of a per-key distinct set). Sketch values are
 *    engine-specific so the driver check is rows-only; ApproxDistinctSpec
 *    pins relative error <= 5% (the configured rsd) against the exact
 *    query.
 */
object ScaleQueries extends QueryPack {

  private val Salt = 8
  // CMS geometry shared by cmsHeavyHittersFull and the recovery verdict
  private[graft] val CmsD = 4
  private[graft] val CmsW = 512

  /** Informative GK-quantile frame: the sketch values themselves plus the
    * per-quantile empirical-rank bound checks. ApproxDistinctSpec pins the
    * values against exact ranks; the registered query projects the
    * deterministic bound-check columns. */
  private[graft] def quantilesApproxFull(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val approx = events(s, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile_approx(value, array(0.5, 0.9, 0.99), 10000)").as("qs"))
      .select(col("event_type"),
        element_at(col("qs"), 1).as("p50"),
        element_at(col("qs"), 2).as("p90"),
        element_at(col("qs"), 3).as("p99"))
    def rankOk(v: org.apache.spark.sql.Column, q: Double) = {
      val n = count(lit(1)).cast("double")
      val le = sum(when(col("value") <= v, 1L).otherwise(0L)) / n
      val lt = sum(when(col("value") < v, 1L).otherwise(0L)) / n
      val eps = lit(1.0 / 10000) + lit(2.0) / n
      lt - eps <= lit(q) && lit(q) <= le + eps
    }
    events(s, dir).select(col("event_type"), col("value"))
      .join(broadcast(approx), Seq("event_type"))
      .groupBy(col("event_type"), col("p50"), col("p90"), col("p99"))
      .agg(rankOk(col("p50"), 0.5).as("p50_ok"),
        rankOk(col("p90"), 0.9).as("p90_ok"),
        rankOk(col("p99"), 0.99).as("p99_ok"))
      .withColumn("pass", col("p50_ok") && col("p90_ok") && col("p99_ok"))
  }

  /** Informative HLL frame: sketch value, exact count, 3σ bound check. */
  private[graft] def distinctApproxFull(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.05).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("approx_users"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          lit(0.15) * col("exact_users")).as("pass"))

  /** Informative CMS frame over ALL keys: per-key estimate, exact count,
    * overcount, and the CmsSketchSpec error bound as `bound_ok`. The
    * sketch spelling is shared with the STREAMING form (CmsSignals.sketch
    * is an update-mode aggregation with d×w-bounded state on a stream;
    * batch↔stream sketch identity pinned by EventStreamsSpec). */
  private[graft] def cmsHeavyHittersFull(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val D = CmsD
    val W = CmsW
    val ds = array((0 until D).map(lit): _*)
    val bucket = graft.functions.CmsSignals.bucket(col("user_id"), col("d"), W)
    val e = events(s, dir).select(col("user_id"))
    val cms = graft.functions.CmsSignals.sketch(e, "user_id", D, W)
    val exact = e.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
    val total = e.agg(count(lit(1)).as("n_total"))
    exact
      .withColumn("d", explode(ds))
      .withColumn("bucket", bucket)
      .join(cms, Seq("d", "bucket"))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("c")).as("est_n"))
      .crossJoin(broadcast(total))
      .select(col("user_id"), col("est_n"), col("exact_n"),
        (col("est_n") - col("exact_n")).as("overcount"),
        (col("est_n") >= col("exact_n") &&
          (col("est_n") - col("exact_n")) * lit(W) <= lit(4) * col("n_total"))
          .as("bound_ok"))
  }

  override def queries: Map[String, Q] = Map(
    "events_salted_user_counts" -> ((s, dir) =>
      events(s, dir)
        .withColumn("salt", pmod(hash(col("event_id")), lit(Salt)))
        .groupBy(col("user_id"), col("salt"))
        .agg(count(lit(1)).as("partial_n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 3)))
            .as("partial_v"))
        .groupBy(col("user_id"))
        .agg(sum(col("partial_n")).as("n_events"),
          sum(col("partial_v")).cast("double").as("total_value"))
        .orderBy(col("user_id"))),

    // Salted JOIN — the join-side companion to the salted aggregation
    // above. A hot probe key floods one reducer in a plain shuffle join;
    // here the small side is REPLICATED once per salt (explode over
    // 0..Salt-1) and the probe side picks a deterministic salt from
    // event_id, so the join key becomes (user_id, salt) and each hot key
    // spreads over Salt reducers. Every probe row matches exactly one
    // replica, so the result is identical to the plain join — the DuckDB
    // oracle IS the plain join, verifying the pattern, not just running
    // it. (At local scale AQE broadcasts the replicated dim and the salt
    // is moot; past the broadcast threshold the plan degrades gracefully
    // to the salted shuffle join this query exists to pin down.)
    "events_skew_join_salted" -> ((s, dir) => {
      val e = events(s, dir)
      val dim = e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("user_n"))
        .withColumn("activity",
          when(col("user_n") >= 80, "heavy")
            .when(col("user_n") >= 60, "mid")
            .otherwise("light"))
      val saltedDim = dim.withColumn("salt",
        explode(sequence(lit(0), lit(Salt - 1))))
      e.withColumn("salt", pmod(hash(col("event_id")), lit(Salt)))
        .join(saltedDim, Seq("user_id", "salt"))
        .groupBy(col("event_type"), col("activity"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("activity"))
    }),

    "events_distinct_users_exact" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_users"))
        .orderBy(col("event_type"))),

    // Z-order layout key — multi-dimensional clustering for scan pruning.
    // Sorting a 100 TB table by the interleaved-bit key of (user_id,
    // minute-of-day) clusters row groups so parquet min/max stats prune
    // BOTH `user_id = ?` and time-range predicates (a single-column sort
    // only prunes one). The key is pure codegen'd bit arithmetic
    // (16 bits per dimension, bit-identical on any engine); the rollup
    // groups by the top-16 key bits — each "block" is what one file/row
    // group would hold after `sortWithinPartitions(z)` — and the per-block
    // min/max ranges ARE the stats pruning would use: the oracle checks
    // both the key math and the locality it buys.
    "layout_zorder" -> ((s, dir) => {
      val x = col("user_id").bitwiseAND(lit(65535L))
      val z = (0 until 16).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(shiftleft(shiftright(col("m"), i).bitwiseAND(lit(1L)), 2 * i + 1))
      }.reduce(_ bitwiseOR _)
      events(s, dir)
        .withColumn("m", (hour(col("ts")) * 60 + minute(col("ts"))).cast("long"))
        .withColumn("z", z)
        .groupBy(shiftright(col("z"), 16).as("zblock"))
        .agg(count(lit(1)).as("n"),
          min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
          min(col("m")).as("min_minute"), max(col("m")).as("max_minute"))
        .orderBy(col("zblock"))
    }),

    // Approximate quantiles (Greenwald–Khanna summaries, the fixed-size
    // sketch path): same outputs as the exact events_value_quantiles but
    // with bounded per-group state at any row count — the 100 TB
    // companion of the exact query, exactly like the HLL/exact distinct
    // split below. Rank error <= n/accuracy; the empirical-rank test in
    // ApproxDistinctSpec pins the returned values against the exact ranks
    // (via quantilesApproxFull — the informative frame with the sketch
    // values themselves).
    //
    // The REGISTERED surface is the deterministic verdict shape: the GK
    // values are engine-specific, but the GK GUARANTEE is not — each
    // returned value's empirical rank must sit within q ± (rank error
    // n/accuracy + value discreteness 2/n). The per-quantile bound checks
    // are therefore deterministically TRUE whenever the sketch honors its
    // contract, which makes the whole row hash-matchable by a DuckDB
    // oracle that derives the group skeleton and predicts the booleans —
    // a broken sketch flips a bool and fails the driver's hash compare.
    "events_value_quantiles_approx" -> ((s, dir) =>
      quantilesApproxFull(s, dir)
        .select(col("event_type"), col("p50_ok"), col("p90_ok"),
          col("p99_ok"), col("pass"))
        .orderBy(col("event_type"))),

    // `pass` = relative error within 3×rsd (the ±3σ HLL guarantee;
    // ApproxDistinctSpec pins the tighter observed 1σ on the fixture via
    // distinctApproxFull, which carries the sketch value itself).
    // The exact-distinct column exists ONLY for this audit — it re-adds
    // the per-key distinct shuffle the sketch exists to avoid, which is
    // fine at verification scale; the production 100 TB path is the
    // one-line approx_count_distinct agg without the rider (fixed-size
    // sketch state, single map-side-combined shuffle).
    //
    // Registered surface = deterministic verdict shape: the HLL value is
    // engine-specific, but the exact count and the error-bound boolean
    // are not, so the row is fully hash-checkable — the DuckDB oracle
    // recomputes exact_users and predicts pass=true.
    "events_distinct_users_approx" -> ((s, dir) =>
      distinctApproxFull(s, dir)
        .select(col("event_type"), col("exact_users"), col("pass"))
        .orderBy(col("event_type"))),

    // Bloom-filter semi join: the build side aggregates urgent custkeys
    // into a ~100 KiB bloom filter (distributed partial-agg build, tiny
    // collected sketch — the runtime-filter pattern Catalyst injects for
    // shuffle joins, here explicit); the probe scan drops non-members
    // BEFORE the exact semi-join that removes the bloom's false
    // positives. Result is therefore EXACTLY the plain semi join — the
    // oracle verifies the pattern, not just runs it. At 100 TB the win
    // is that the pruned probe rows never reach the join shuffle.
    "bloom_semi_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val bloom = urgent
        .agg(graft.functions.SketchFunctions.bloomFilterAgg(
          xxhash64(col("o_custkey")), 100000L, 800000L).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      t(s, dir, "customer")
        .filter(graft.functions.SketchFunctions.mightContain(
          bloom, xxhash64(col("c_custkey"))))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_urgent_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // Count-min sketch heavy hitters: per-key frequency estimates from
    // D×W bounded counters instead of a per-key exact map — the sketch
    // table is ≤ D*W rows whatever the key cardinality, and builds in
    // one partial-agg pass (explode by D is map-side). est_n is the min
    // over D hashed-bucket counts (never below the true count); the
    // exact count rides along so the overcount is driver-visible, and
    // CmsSketchSpec pins est >= exact plus the N/W error bound. Sketch
    // values are hash-layout-specific → no cross-engine oracle
    // (rows-only), same policy as the HLL/GK queries above.
    // Registered surface = deterministic verdict shape over the EXACT
    // top-20 heavy hitters (exact_n desc, user_id — both engines derive
    // the identical row set): the CMS estimates themselves are
    // hash-layout-specific, but every guarantee the sketch makes is
    // boolean-checkable against the exact counts, so the row hashes. Per
    // row: `bound_ok` (est >= exact, and min-over-D overcount within
    // B = 4×N/W expected collisions — the CmsSketchSpec bound).
    // Globally: `heavy_recovered_ok`, the CMS recovery THEOREM — any key
    // whose exact count strictly beats the 20th exact count + B must
    // appear in the est-ranked top-20 (proof: est never undercounts, so
    // est(k) >= exact(k) > exact20th + B >= est(j) for every j outside
    // the exact top-20 once every key honors the bound; only the other
    // 19 exact-top keys can outrank it). When key counts sit below the
    // sketch noise floor — e.g. the 1500-uniform-user sf0.1 fixture,
    // where max(exact)=99 < N/W=195 — NO key qualifies and the check is
    // vacuously true, which is the honest answer: recovering a top-20 by
    // frequency that the sketch's own error bars drown is not a CMS
    // guarantee (at 100 TB you size W against the target heavy-hitter
    // frequency, W >> N/min_heavy_count, exactly to keep keys above this
    // floor). cmsHeavyHittersFull keeps the est-ranked informative frame
    // for CmsSketchSpec, which also pins the empirical >= 15/20 set
    // overlap on the distinctly-heavy sf0.001 fixture.
    "events_heavy_hitters_cms" -> ((s, dir) => {
      val full = cmsHeavyHittersFull(s, dir).localCheckpoint()
      val exactTop = full.orderBy(col("exact_n").desc, col("user_id"))
        .limit(20).select(col("user_id"), col("exact_n"), col("bound_ok"))
      val floor = exactTop
        .agg(min(col("exact_n")).as("exact20th"))
      val total = events(s, dir).agg(count(lit(1)).as("n_total"))
      val est20 = full.orderBy(col("est_n").desc, col("user_id")).limit(20)
        .select(col("user_id"))
      // integer-exact spelling of exact_n > exact20th + 4N/W
      val clearly = full.crossJoin(broadcast(floor)).crossJoin(broadcast(total))
        .filter(col("exact_n") * lit(CmsW) >
          col("exact20th") * lit(CmsW) + lit(4) * col("n_total"))
        .select(col("user_id"))
      val verdictAgg = clearly.join(est20, Seq("user_id"), "left_anti")
        .agg((count(lit(1)) === 0).as("heavy_recovered_ok"))
      val allBounds = full.agg(min(col("bound_ok")).as("all_bounds_ok"))
      exactTop.crossJoin(broadcast(verdictAgg)).crossJoin(broadcast(allBounds))
        .select(col("user_id"), col("exact_n"), col("bound_ok"),
          col("heavy_recovered_ok"),
          (col("bound_ok") && col("all_bounds_ok") && col("heavy_recovered_ok"))
            .as("pass"))
        .orderBy(col("exact_n").desc, col("user_id"))
    }),

    // Sketch MERGE surface — the property a sharded ingest pipeline
    // needs: two shards sketch independently, the d×w counter tables
    // combine with one tiny partial agg, and the merged sketch must be
    // CELL-FOR-CELL identical to sketching the union (CMS counters are
    // additive — merge is exact, not approximate). The verdict row set
    // is one row per depth: total_c (= N, every event increments exactly
    // one cell per depth — oracle-predictable) and `merge_exact`
    // (full-outer cell compare of merged vs whole-corpus sketch). A
    // merge bug — dropped cell, double count, geometry drift — breaks
    // either the predictable total or the equality boolean and fails
    // the driver hash.
    "events_cms_shard_merge" -> ((s, dir) => {
      import graft.functions.CmsSignals
      val e = events(s, dir).select(col("event_id"), col("user_id"))
      val shardA = e.filter(pmod(col("event_id"), lit(2)) === 0)
      val shardB = e.filter(pmod(col("event_id"), lit(2)) === 1)
      val merged = CmsSignals.merge(
          CmsSignals.sketch(shardA, "user_id", CmsD, CmsW),
          CmsSignals.sketch(shardB, "user_id", CmsD, CmsW))
        .withColumnRenamed("c", "mc")
      val whole = CmsSignals.sketch(e, "user_id", CmsD, CmsW)
        .withColumnRenamed("c", "wc")
      merged.join(whole, Seq("d", "bucket"), "full_outer")
        .groupBy(col("d"))
        .agg(sum(coalesce(col("wc"), lit(0L))).as("total_c"),
          min(coalesce(col("mc"), lit(-1L)) === coalesce(col("wc"), lit(-2L)))
            .as("merge_exact"))
        .select(col("d"), col("total_c"), col("merge_exact"),
          col("merge_exact").as("pass"))
        .orderBy(col("d"))
    }),

    // The HLL companion: per-shard DataSketches HLL sketches union'd
    // with `hll_union_agg` — distinct-count state that merges across
    // shards without rescanning (register-wise max, the HLL merge law).
    // Unlike CMS the union estimate is not bit-identical to the
    // direct-build estimate (union drops the HIP estimator), so the
    // contract here is the error bound: the union'd estimate must land
    // within 3σ of the exact distinct count (lgK=12 → rsd ≈ 1.6%, bound
    // 5%). exact_users and the bound boolean are the oracle-checked
    // verdict; ApproxDistinctSpec pins union-vs-direct agreement on the
    // informative values.
    // The SKETCH CUBE — one pass builds per-(type, day) HLL cells; every
    // coarser distinct-count rolls up by UNIONING CELL SKETCHES (register
    // max), never rescanning the raw table: the OLAP property that lets a
    // 100 TB events store answer "distinct users last quarter, by type,
    // overall" from kilobytes of pre-aggregated cells. The exact-distinct
    // columns exist only as the verification rider (they re-add the
    // distinct shuffle the cube exists to avoid); `pass` pins every
    // level's union-estimate within 5% of exact, so a broken union (e.g.
    // summing estimates instead of unioning registers — the classic cube
    // mistake that double-counts cross-cell users) flips a boolean and
    // fails the driver hash.
    "events_sketch_cube" -> ((s, dir) => {
      val e = events(s, dir).withColumn("day", to_date(col("ts")))
        .select(col("event_type"), col("day"), col("user_id"))
      val cells = e.groupBy(col("event_type"), col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk")).localCheckpoint()
      def verdict(approx: org.apache.spark.sql.Column,
          exact: org.apache.spark.sql.Column) =
        (abs(approx - exact) <= lit(0.05) * exact).as("pass")
      val cellLvl = e.groupBy(col("event_type"), col("day"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .join(cells, Seq("event_type", "day"))
        .select(lit("cell").as("level"), col("event_type"),
          col("day").cast("timestamp").as("event_day"), col("exact_users"),
          verdict(hll_sketch_estimate(col("sk")), col("exact_users")))
      val typeLvl = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .join(cells.groupBy(col("event_type"))
          .agg(hll_union_agg(col("sk")).as("sk")), Seq("event_type"))
        .select(lit("type").as("level"), col("event_type"),
          lit(null).cast("timestamp").as("event_day"), col("exact_users"),
          verdict(hll_sketch_estimate(col("sk")), col("exact_users")))
      val allLvl = e.agg(countDistinct(col("user_id")).as("exact_users"))
        .crossJoin(cells.agg(hll_union_agg(col("sk")).as("sk")))
        .select(lit("all").as("level"),
          lit(null).cast("string").as("event_type"),
          lit(null).cast("timestamp").as("event_day"), col("exact_users"),
          verdict(hll_sketch_estimate(col("sk")), col("exact_users")))
      cellLvl.unionByName(typeLvl).unionByName(allLvl)
        .orderBy(col("level"), col("event_type"), col("event_day"))
    }),

    "events_hll_shard_union" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("event_type"),
        col("user_id"))
      val unioned = e
        .withColumn("shard", pmod(col("event_id"), lit(4)))
        .groupBy(col("event_type"), col("shard"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .groupBy(col("event_type"))
        .agg(hll_union_agg(col("sk")).as("sk"))
        .select(col("event_type"),
          hll_sketch_estimate(col("sk")).as("approx_users"))
      val exact = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      exact.join(unioned, Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            lit(0.05) * col("exact_users")).as("pass"))
        .orderBy(col("event_type"))
    }),

    // Table profiling (the ANALYZE/SUMMARIZE pass an engine runs before
    // planning or after ingest): per-column null count, exact distinct
    // count, and min/max over `orders`, one single-row aggregate branch
    // per column unioned together. Each branch's scan prunes to ITS
    // column (total bytes read = the one-pass variant, which must read
    // all profiled columns anyway) and plans a small, cacheable codegen
    // unit — the "one big agg" alternative (6 distinct aggregates fused
    // into one Expand) generated a codegen unit large enough that plan
    // compilation dominated: 3.5s per fresh plan vs 0.1s execution, a
    // 25x wall-clock difference at bench scale. The 100 TB one-pass
    // profile swaps count(distinct) for approx_count_distinct (see
    // events_distinct_users_approx), which needs no Expand at all.
    // Representations are engine-portable by construction: BIGINT and
    // VARCHAR min/max verbatim, DOUBLE via floor→BIGINT (a profile wants
    // magnitude, and double→string formatting differs across engines),
    // TIMESTAMP via second-truncated formatting.
    "table_profile" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def prof(cname: String, minRepr: org.apache.spark.sql.Column,
          maxRepr: org.apache.spark.sql.Column) =
        o.agg(count(lit(1)).as("n_rows"),
            (count(lit(1)) - count(col(cname))).as("n_nulls"),
            countDistinct(col(cname)).as("n_distinct"),
            minRepr.as("min_repr"), maxRepr.as("max_repr"))
          .select(lit(cname).as("column_name"), col("n_rows"),
            col("n_nulls"), col("n_distinct"), col("min_repr"),
            col("max_repr"))
      def asIs(c: String) = prof(c,
        min(col(c)).cast("string"), max(col(c)).cast("string"))
      def viaFloor(c: String) = prof(c,
        floor(min(col(c))).cast("string"), floor(max(col(c))).cast("string"))
      def viaSecond(c: String) = prof(c,
        date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss"),
        date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss"))
      Seq(asIs("o_orderkey"), asIs("o_custkey"), asIs("o_orderstatus"),
          viaFloor("o_totalprice"), viaSecond("o_orderdate"),
          asIs("o_orderpriority"))
        .reduce(_ unionByName _)
        .orderBy(col("column_name"))
    }),

    // Small-file compaction planner — the table-maintenance pass every
    // 100 TB lake runs continuously: given a file manifest (here derived
    // deterministically from orders: partition = order month, file =
    // orderkey mod 40, bytes = exact integer price sum), assign files to
    // fixed-capacity compaction bins by exclusive running size within
    // each partition. The plan NEVER touches data bytes: the manifest is
    // metadata-sized (one row per file), so the whole pass is one
    // partition-keyed window over O(files) rows — the rewrite jobs the
    // bins describe are what stream the data, one bin per task,
    // partition boundaries never crossed. All-integer arithmetic, so the
    // oracle is hash-exact.
    "layout_compaction_plan" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val target = 2000000L
      val manifest = t(s, dir, "orders")
        .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("part"),
          (col("o_orderkey") % 40).as("file_id"))
        .agg(sum(floor(col("o_totalprice")).cast("long")).as("file_bytes"))
      val w = Window.partitionBy("part").orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      manifest
        .withColumn("cum_excl",
          coalesce(sum(col("file_bytes")).over(w), lit(0L)))
        .withColumn("bin", floor(col("cum_excl") / target).cast("long"))
        .groupBy(col("part"), col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("file_bytes")).as("bin_bytes"),
          min(col("file_id")).as("first_file"), max(col("file_id")).as("last_file"))
        .orderBy(col("part"), col("bin"))
    }),

    // Compaction EXECUTOR — the write half of the layout story (VERDICT
    // r9 ask #4; reference anchor: the whole-file Save() rewrite,
    // MerkonDatabase.cs:149-162, which rewrote the ENTIRE store per
    // mutation — this rewrites only the planned bins). Flow:
    //  1. materialize a genuinely fragmented table: one REAL parquet
    //     file per (order year, o_orderkey % 8) — repartition on the
    //     write-partition keys puts each group in exactly one task, so
    //     each dir gets exactly one file;
    //  2. bin-pack on the DETERMINISTIC logical size (per-file
    //     floor-price sum — physical parquet bytes are engine-specific,
    //     so the oracle could not predict them), target = total size /
    //     3 bins per partition in pure integer arithmetic;
    //  3. rewrite: ONE shuffle keyed (part, bin) — each bin is built by
    //     exactly one task, so each part=/bin= dir holds exactly one
    //     output file; partition boundaries are never crossed, matching
    //     the plan's contract;
    //  4. prove it: `one_file_out` is counted off the REAL filesystem
    //     (every planned bin exists, exactly one data file, no extras),
    //     and `content_ok` compares per-part row counts and XOR-reduced
    //     full-row xxhash64 between the ORIGINAL orders and the
    //     compacted read — a lost/duplicated/corrupted row flips it.
    //     DuckDB re-derives the (part, bin, n_files, bin_bytes, n_rows)
    //     skeleton from orders and predicts both booleans true, so the
    //     driver hash fails on any rewrite defect.
    "layout_compaction_apply" -> ((s, dir) => {
      val wh = java.nio.file.Files.createTempDirectory("graft_compact")
        .toString
      val orders = t(s, dir, "orders")
      val keyed = orders
        .withColumn("part", year(col("o_orderdate")).cast("long"))
        .withColumn("file_id", (col("o_orderkey") % 8).cast("long"))
      // 1. fragmented source: one real file per (part, file_id)
      keyed.repartition(col("part"), col("file_id"))
        .write.partitionBy("part", "file_id").mode("overwrite")
        .parquet(s"$wh/frag")
      val frag = s.read.parquet(s"$wh/frag")
        .withColumn("part", col("part").cast("long"))
        .withColumn("file_id", col("file_id").cast("long"))
      // 2. the plan: logical manifest -> integer bin-pack, ~3 bins/part
      val manifest = frag.groupBy(col("part"), col("file_id"))
        .agg(sum(floor(col("o_totalprice")).cast("long")).as("file_bytes"))
        .localCheckpoint()
      val tgt = manifest
        .agg(sum(col("file_bytes")).as("sz"),
          (countDistinct(col("part")) * 3).as("p3"))
        .select(expr("(sz + p3 - 1) div p3").as("target")) // ceil, pure ints
      // the shared bin-pack skeleton — the same call MerkonStore
      // .compactSaved plans its targeted rewrite with
      val planned = graft.store.LayoutCompaction
        .assignBins(manifest, Seq("part"), Seq("file_id"), "file_bytes", tgt)
        .select(col("part"), col("file_id"), col("file_bytes"), col("bin"))
        .localCheckpoint()
      // 3. execute: one shuffle keyed (part, bin) -> one file per bin
      frag.join(planned.select("part", "file_id", "bin"),
          Seq("part", "file_id"))
        .drop("file_id") // the old file identity dies with the rewrite
        .repartition(col("part"), col("bin"))
        .write.partitionBy("part", "bin").mode("overwrite")
        .parquet(s"$wh/compacted")
      // 4a. filesystem proof: every planned bin -> exactly one data file
      val fs = new org.apache.hadoop.fs.Path(wh)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val binDirRe = ".*/part=(-?\\d+)/bin=(-?\\d+)/[^/]+\\.parquet$".r
      val outFiles = {
        val it = fs.listFiles(
          new org.apache.hadoop.fs.Path(s"$wh/compacted"), true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        while (it.hasNext) {
          val p = it.next().getPath.toString
          p match {
            case binDirRe(pt, b) => buf += ((pt.toLong, b.toLong))
            case _ =>
          }
        }
        buf.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      }
      val outCounts = s.createDataFrame(outFiles.toSeq)
        .toDF("part", "bin", "files_out")
      // 4b. content proof: original orders vs the compacted read —
      // per-part row count and XOR of full-row hashes must both agree
      // bit_xor, not sum: an order-free reduction of full-row hashes
      // that cannot overflow (ANSI mode makes a long-sum of hashes throw)
      val hashExpr = s"xxhash64(${orders.columns.mkString(", ")})"
      def sig(df: org.apache.spark.sql.DataFrame,
          partCol: org.apache.spark.sql.Column) = df
        .groupBy(partCol.as("part"))
        .agg(count(lit(1)).as("nr"),
          expr(s"bit_xor($hashExpr)").as("hs"))
      val contentOk = sig(orders, year(col("o_orderdate")).cast("long"))
        .as("a")
        .join(sig(s.read.parquet(s"$wh/compacted"),
          col("part").cast("long")).as("b"), Seq("part"), "full")
        .agg(min(coalesce(col("a.nr") === col("b.nr") &&
          col("a.hs") === col("b.hs"), lit(false))).as("content_ok"))
      val rowsPerBin = frag
        .join(planned.select("part", "file_id", "bin"), Seq("part", "file_id"))
        .groupBy(col("part"), col("bin")).agg(count(lit(1)).as("n_rows"))
      val verdictFrame = planned.groupBy(col("part"), col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("file_bytes")).as("bin_bytes"))
        .join(rowsPerBin, Seq("part", "bin"))
        .join(outCounts, Seq("part", "bin"), "left")
        .crossJoin(broadcast(contentOk))
        .select(col("part"), col("bin"), col("n_files"), col("bin_bytes"),
          col("n_rows"),
          coalesce(col("files_out") === 1L, lit(false)).as("one_file_out"),
          col("content_ok"))
        .orderBy(col("part"), col("bin"))
        // pin the ~20 verdict rows eagerly, then drop the scratch
        // warehouse: the frame must not lazily re-read $wh after the
        // delete, and without the delete every Verify/Bench/spec run
        // leaves two dataset-sized parquet copies in java.io.tmpdir
        .localCheckpoint()
      fs.delete(new org.apache.hadoop.fs.Path(wh), true)
      verdictFrame
    }),

    // Equi-depth range-partition boundaries — the split-point planning a
    // sorted/bucketed write or a range shuffle needs: per order
    // priority, 8 same-size value buckets of o_totalprice with their
    // [lo, hi] fences. The window is keyed by priority (bounded by the
    // largest group, the same discipline as corpus_quality_adaptive),
    // never a single global sort task; ntile ordering carries the
    // o_orderkey tie-break so bucket membership is a total order both
    // engines agree on. The 100 TB variant swaps exact ntile for sampled
    // quantiles (RangePartitioner-style; see events_value_quantiles_approx
    // for the bounded-sketch analog) — exact ntile is the oracle-able
    // bench form that pins the contract.
    "layout_range_boundaries" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("tile", ntile(8).over(w))
        .groupBy(col("o_orderpriority"), col("tile"))
        .agg(count(lit(1)).as("n_rows"),
          min(floor(col("o_totalprice")).cast("long")).as("lo"),
          max(floor(col("o_totalprice")).cast("long")).as("hi"))
        .orderBy(col("o_orderpriority"), col("tile"))
    }),

    // Bucketed co-location — the layout feature that DELETES the shuffle
    // instead of surviving it (the salting/AQE patterns above make skewed
    // shuffles safe; bucketing makes the recurring fact-to-fact join
    // shuffle not exist). Both tables are written `bucketBy(8, orderkey)
    // .sortBy(orderkey)`; a bucketed scan exposes hash-partitioning on
    // the bucket key, so the merge join's clustering requirement is
    // already satisfied — and the per-ORDER aggregate's too, because
    // hash(o_orderkey) co-locates every (o_orderkey, o_orderpriority)
    // group. The whole join + aggregate runs with ZERO exchanges (limit
    // is TakeOrdered, also exchange-free), which at 100 TB is the
    // difference between re-shuffling both fact tables on every join of
    // a hot key path and never shuffling them after the one-time layout
    // write. The `shuffle_free` column is read off the EXECUTED plan
    // (no ShuffleExchange + the join is the hinted SortMergeJoin), so the
    // driver's hash compare fails if the layout ever stops eliding the
    // shuffle; the revenue rows hash-check against DuckDB's plain join.
    "layout_bucketed_join" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val wh = java.nio.file.Files.createTempDirectory("graft_buckets")
        .toString
      def bucketWrite(df: org.apache.spark.sql.DataFrame, key: String,
          table: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS $table")
        df.write.bucketBy(8, key).sortBy(key)
          .option("path", s"$wh/$table").mode("overwrite").saveAsTable(table)
      }
      bucketWrite(t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority")),
        "o_orderkey", "graft_orders_bucketed")
      bucketWrite(t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        "l_orderkey", "graft_lineitem_bucketed")
      val one = lit(1).cast(DecimalType(4, 3))
      val agg = s.table("graft_orders_bucketed").hint("merge")
        .join(s.table("graft_lineitem_bucketed"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(DecimalType(18, 3)) *
            (one - col("l_discount").cast(DecimalType(4, 3))))
            .cast("double").as("revenue"))
      // collect real ShuffleExchangeExec NODES (the node's string name is
      // just "Exchange", so a substring test on "ShuffleExchange" is
      // vacuously true and can never fire) — unwrap the AQE wrapper the
      // way BucketedJoinSpec does
      val exec = agg.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val shuffleFree = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty && exec.toString.contains("SortMergeJoin")
      val out = agg.select(col("o_orderkey"), col("o_orderpriority"),
          col("n_items"), col("revenue"), lit(shuffleFree).as("shuffle_free"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)
        // pin the 20 rows, then drop the bucket warehouse (no tmpdir
        // litter; the catalog entries are recreated per invocation)
        .localCheckpoint()
      new org.apache.hadoop.fs.Path(wh)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(wh), true)
      out
    }),

    // Dynamic partition pruning — the third layout lever next to
    // bucketing (shuffle deletion) and Z-order (row-group pruning):
    // date-partitioned fact + a dim whose filter is NOT statically
    // inferable (busy days = above-average volume, a data-derived cut),
    // so the only way the fact scan avoids reading every partition is
    // Spark's runtime DPP subquery — at 100 TB the difference between
    // scanning the full history and only the qualifying days' files.
    // The filter is deliberately on a dim ATTRIBUTE (n_day vs the
    // broadcast mean), not on the join key, so InferFiltersFromConstraints
    // cannot turn it into a static partition predicate. `partition_pruned`
    // is read off the EXECUTED plan (the scan's PartitionFilters carry a
    // dynamicpruning expression), so the driver hash fails if DPP ever
    // stops firing; the per-day rows hash-check against DuckDB's plain
    // join, and n_day == n_events is a built-in cross-check (dim-side
    // and fact-side counts of the same partition must agree).
    "layout_partition_pruning" -> ((s, dir) => {
      val wh = java.nio.file.Files.createTempDirectory("graft_dpp").toString
      val ev = events(s, dir)
      ev.withColumn("event_date", to_date(col("ts")))
        .write.partitionBy("event_date").mode("overwrite")
        .parquet(s"$wh/events_by_date")
      val fact = s.read.parquet(s"$wh/events_by_date")
      val dayCounts = ev.groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n_day"))
      // one tiny driver scalar (as pagerank's node count): the cut must
      // be a literal comparison for PartitionPruning's isLikelySelective
      // check to accept the dim filter — an attr-vs-attr compare (the
      // broadcast-mean crossJoin spelling) is not considered selective
      // and DPP never fires
      val cap = dayCounts.agg(avg(col("n_day"))).head.getDouble(0)
      val busy = dayCounts.filter(col("n_day") > lit(cap))
        .select(col("event_date"), col("n_day"))
      val agg = fact.join(broadcast(busy), "event_date")
        .groupBy(col("event_date"), col("n_day"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
      val plan = agg.queryExecution.executedPlan.toString
      val pruned = plan.contains("dynamicpruning")
      // DATE surfaces as python date objects via parquet->pandas but
      // datetime64 via DuckDB — emit as timestamp so dtypes agree
      val out = agg.select(col("event_date").cast("timestamp").as("event_day"),
          col("n_day"), col("n_events"),
          col("n_users"), lit(pruned).as("partition_pruned"))
        .orderBy(col("event_day"))
        // pin, then drop the partitioned scratch table (no tmpdir litter)
        .localCheckpoint()
      new org.apache.hadoop.fs.Path(wh)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(wh), true)
      out
    })
  )

  override def oracleSql: Map[String, String] = Map(
    // Sketch-family verdict oracles: the sketch VALUES are engine-specific
    // (no cross-engine hash), but the deterministic skeleton (group set /
    // exact counts / exact top-20) plus the guarantee booleans ARE
    // oracle-predictable — DuckDB derives the skeleton from the same
    // tables and predicts every bound check true. A sketch regression
    // flips a boolean (or changes the cardinality) and fails the hash.
    "events_value_quantiles_approx" ->
      """SELECT event_type, true AS p50_ok, true AS p90_ok,
        |  true AS p99_ok, true AS pass
        |FROM (SELECT DISTINCT event_type FROM events)
        |ORDER BY event_type""".stripMargin,
    "events_distinct_users_approx" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  true AS pass
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_heavy_hitters_cms" ->
      """SELECT user_id, count(*) AS exact_n, true AS bound_ok,
        |  true AS heavy_recovered_ok, true AS pass
        |FROM events GROUP BY user_id
        |ORDER BY exact_n DESC, user_id LIMIT 20""".stripMargin,
    // merge is exact, so every boolean is predictably true and total_c
    // per depth is exactly the event count (each event increments one
    // cell per depth row).
    "events_cms_shard_merge" ->
      """SELECT CAST(d AS INT) AS d,
        |  (SELECT count(*) FROM events) AS total_c,
        |  true AS merge_exact, true AS pass
        |FROM (SELECT unnest([0, 1, 2, 3]) AS d)
        |ORDER BY d""".stripMargin,
    "events_hll_shard_union" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  true AS pass
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_sketch_cube" ->
      """WITH base AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, user_id FROM events
        |)
        |SELECT 'cell' AS level, event_type,
        |  CAST(day AS TIMESTAMP) AS event_day,
        |  count(DISTINCT user_id) AS exact_users, true AS pass
        |FROM base GROUP BY event_type, day
        |UNION ALL
        |SELECT 'type', event_type, CAST(NULL AS TIMESTAMP),
        |  count(DISTINCT user_id), true
        |FROM base GROUP BY event_type
        |UNION ALL
        |SELECT 'all', CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP),
        |  count(DISTINCT user_id), true
        |FROM base
        |ORDER BY level, event_type, event_day""".stripMargin,
    "layout_compaction_plan" ->
      """WITH manifest AS (
        |  SELECT EXTRACT(year FROM o_orderdate) * 100
        |           + EXTRACT(month FROM o_orderdate) AS part,
        |    o_orderkey % 40 AS file_id,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS file_bytes
        |  FROM orders GROUP BY 1, 2
        |), binned AS (
        |  SELECT part, file_id, file_bytes,
        |    CAST(floor(COALESCE(sum(file_bytes) OVER (
        |      PARTITION BY part ORDER BY file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      / 2000000.0) AS BIGINT) AS bin
        |  FROM manifest
        |)
        |SELECT part, bin, count(*) AS n_files,
        |  CAST(sum(file_bytes) AS BIGINT) AS bin_bytes,
        |  min(file_id) AS first_file, max(file_id) AS last_file
        |FROM binned GROUP BY part, bin ORDER BY part, bin""".stripMargin,
    // The executor's skeleton re-derived from orders alone (logical
    // sizes, integer bin-pack, per-bin row counts); the two rewrite
    // proofs — one real file per bin, content equality — are
    // Spark-verified booleans DuckDB predicts true, so a rewrite defect
    // flips a hashed value and fails the gate.
    "layout_compaction_apply" ->
      """WITH m AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS part,
        |    o_orderkey % 8 AS file_id,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS fb,
        |    count(*) AS nr
        |  FROM orders GROUP BY 1, 2
        |), tgt AS (
        |  SELECT (CAST(sum(fb) AS BIGINT) + count(DISTINCT part) * 3 - 1)
        |    // (count(DISTINCT part) * 3) AS target FROM m
        |), binned AS (
        |  SELECT part, file_id, fb, nr,
        |    CAST(COALESCE(sum(fb) OVER (PARTITION BY part ORDER BY file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // t.target AS BIGINT) AS bin
        |  FROM m, tgt t
        |)
        |SELECT part, bin, count(*) AS n_files,
        |  CAST(sum(fb) AS BIGINT) AS bin_bytes,
        |  CAST(sum(nr) AS BIGINT) AS n_rows,
        |  true AS one_file_out, true AS content_ok
        |FROM binned GROUP BY part, bin ORDER BY part, bin""".stripMargin,
    // The plain join over the un-bucketed tables — equality proves the
    // layout changed the PLAN, not the answer; shuffle_free is the
    // plan-derived contract bit.
    "layout_bucketed_join" ->
      """SELECT o_orderkey, o_orderpriority, count(*) AS n_items,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3)) * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3)))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  true AS shuffle_free
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    // Plain join over the unpartitioned table — equality proves the
    // partitioned layout + DPP changed the PLAN, not the answer.
    "layout_partition_pruning" ->
      """WITH days AS (
        |  SELECT CAST(ts AS DATE) AS event_date, count(*) AS n_day
        |  FROM events GROUP BY 1
        |), busy AS (
        |  SELECT event_date, n_day FROM days
        |  WHERE n_day > (SELECT avg(n_day) FROM days)
        |)
        |SELECT CAST(b.event_date AS TIMESTAMP) AS event_day, b.n_day,
        |  count(*) AS n_events,
        |  count(DISTINCT e.user_id) AS n_users,
        |  true AS partition_pruned
        |FROM events e JOIN busy b ON CAST(e.ts AS DATE) = b.event_date
        |GROUP BY b.event_date, b.n_day
        |ORDER BY event_day""".stripMargin,
    "layout_range_boundaries" ->
      """WITH tiled AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    ntile(8) OVER (PARTITION BY o_orderpriority
        |                   ORDER BY o_totalprice, o_orderkey) AS tile
        |  FROM orders
        |)
        |SELECT o_orderpriority, tile, count(*) AS n_rows,
        |  CAST(floor(min(o_totalprice)) AS BIGINT) AS lo,
        |  CAST(floor(max(o_totalprice)) AS BIGINT) AS hi
        |FROM tiled GROUP BY o_orderpriority, tile
        |ORDER BY o_orderpriority, tile""".stripMargin,
    "table_profile" -> {
      def asIs(c: String) =
        (s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
      def viaFloor(c: String) =
        (s"CAST(CAST(floor(min($c)) AS BIGINT) AS VARCHAR)",
          s"CAST(CAST(floor(max($c)) AS BIGINT) AS VARCHAR)")
      def viaSecond(c: String) =
        (s"strftime(min($c), '%Y-%m-%d %H:%M:%S')",
          s"strftime(max($c), '%Y-%m-%d %H:%M:%S')")
      val cols = Seq(
        ("o_orderkey", asIs("o_orderkey")),
        ("o_custkey", asIs("o_custkey")),
        ("o_orderstatus", asIs("o_orderstatus")),
        ("o_totalprice", viaFloor("o_totalprice")),
        ("o_orderdate", viaSecond("o_orderdate")),
        ("o_orderpriority", asIs("o_orderpriority")))
      val aggs = cols.map { case (c, (mn, mx)) =>
        s"count(*) - count($c) AS nn_$c, count(DISTINCT $c) AS nd_$c, " +
          s"$mn AS mn_$c, $mx AS mx_$c"
      }.mkString(",\n    ")
      val rows = cols.map { case (c, _) =>
        s"SELECT '$c' AS column_name, n_rows, nn_$c AS n_nulls, " +
          s"nd_$c AS n_distinct, mn_$c AS min_repr, mx_$c AS max_repr FROM a"
      }.mkString("\nUNION ALL ")
      s"""WITH a AS (
         |  SELECT count(*) AS n_rows,
         |    $aggs
         |  FROM orders
         |)
         |$rows
         |ORDER BY column_name""".stripMargin
    },
    "events_salted_user_counts" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_skew_join_salted" ->
      """WITH dim AS (
        |  SELECT user_id,
        |    CASE WHEN count(*) >= 80 THEN 'heavy'
        |         WHEN count(*) >= 60 THEN 'mid'
        |         ELSE 'light' END AS activity
        |  FROM events GROUP BY user_id
        |)
        |SELECT e.event_type, d.activity, count(*) AS n
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY e.event_type, d.activity
        |ORDER BY e.event_type, d.activity""".stripMargin,
    "layout_zorder" -> {
      val z = (0 until 16).map { i =>
        s"((((user_id & 65535) >> $i) & 1) << ${2 * i}) | (((m >> $i) & 1) << ${2 * i + 1})"
      }.map(t => s"($t)").mkString(" | ")
      s"""WITH b AS (
         |  SELECT user_id,
         |    CAST(EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts) AS BIGINT) AS m
         |  FROM events
         |), zt AS (
         |  SELECT user_id, m, ($z) AS z FROM b
         |)
         |SELECT z >> 16 AS zblock, count(*) AS n,
         |  min(user_id) AS min_user, max(user_id) AS max_user,
         |  min(m) AS min_minute, max(m) AS max_minute
         |FROM zt GROUP BY zblock ORDER BY zblock""".stripMargin
    },
    "events_distinct_users_exact" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "bloom_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_urgent_customers
        |FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    // events_distinct_users_approx / events_heavy_hitters_cms: no oracle
    // (HLL and CMS sketch values are engine-specific); ApproxDistinctSpec
    // and CmsSketchSpec pin the error bounds.
  )
}

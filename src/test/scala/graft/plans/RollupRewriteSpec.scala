package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Aggregate navigation: registered rollups serve matching GROUP BYs
  * exactly; everything outside the soundness gates keeps its fact scan. */
class RollupRewriteSpec extends AnyFunSuite with SparkTestBase {

  private val factPath = s"$sf0_001/orders.parquet"

  private def naive = spark.read.parquet(factPath)
    .filter(col("o_orderpriority") =!= "1-URGENT")
    .groupBy(col("o_orderstatus"))
    .agg(count(lit(1)).as("n"),
      sum(col("o_totalprice").cast(DecimalType(18, 3))).cast("double")
        .as("total"))

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("matching aggregate rides the rollup, exactly") {
    RollupRegistry.clear()
    val exact = naive.collect().map(_.toSeq).toSet // before registration
    RollupRegistry.register(spark, factPath,
      dims = Seq("o_orderstatus", "o_orderpriority"),
      measures = Seq("o_totalprice"))
    try {
      val p = planOf(naive)
      assert(p.contains("_cnt"), p) // the scan reads rollup columns
      assert(!p.contains("o_custkey"), p)
      assert(naive.collect().map(_.toSeq).toSet == exact)
    } finally RollupRegistry.clear()
  }

  test("min/max/avg ride the rollup exactly — filtered dim subsets included; double-typed sum/avg refused") {
    // VERDICT r15 ask #5: min/max re-aggregate from per-cell _min_/_max_
    // for any orderable type; avg decomposes into the stored sum/count
    // at Spark's own Average types (bit-identical scale-7 rounding)
    RollupRegistry.clear()
    def mma = spark.read.parquet(factPath)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_orderstatus"))
      .agg(min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"),
        avg(col("o_totalprice").cast(DecimalType(18, 3))).as("av"),
        count(lit(1)).as("n"))
    // value-equality reference BEFORE registration (the fact-scan plan)
    val exact = mma.collect().map(_.toSeq).toSet
    // and a CUBE form — min/max must survive the Expand path too
    def mmaCube = spark.read.parquet(factPath)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"))
    val exactCube = mmaCube.collect().map(_.toSeq).toSet
    RollupRegistry.register(spark, factPath,
      dims = Seq("o_orderstatus", "o_orderpriority"),
      measures = Seq("o_totalprice"))
    try {
      val p = planOf(mma)
      assert(p.contains("_min_") && p.contains("_max_"), p)
      assert(mma.collect().map(_.toSeq).toSet == exact,
        "min/max/avg over a FILTERED dim subset drifted off the fact scan")
      val pc = planOf(mmaCube)
      assert(pc.contains("_min_"), pc)
      assert(mmaCube.collect().map(_.toSeq).toSet == exactCube)
      // raw double avg is not re-aggregable from partials: no match
      // (same fence as the raw double sum)
      val rawAvg = spark.read.parquet(factPath)
        .groupBy(col("o_orderstatus"))
        .agg(avg(col("o_totalprice")).as("a"))
      assert(!planOf(rawAvg).contains("_cnt"))
      // min over an UNREGISTERED measure: no match
      val badMin = spark.read.parquet(factPath)
        .groupBy(col("o_orderstatus"))
        .agg(min(col("o_custkey")).as("m"))
      assert(!planOf(badMin).contains("_min_"))
    } finally RollupRegistry.clear()
  }

  test("scalar expressions over rewritable aggregates ride the rollup; nondeterministic wrappers decline (r16)") {
    // dashboard arithmetic — sum/count, count*k, max - min — rewrites by
    // replacing the embedded aggregates and keeping the scalar structure
    // verbatim; value-exact because the aggregates re-aggregate exactly
    RollupRegistry.clear()
    def exprQ = spark.read.parquet(factPath)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_orderstatus"))
      .agg(
        (sum(col("o_totalprice").cast(DecimalType(18, 3))).cast("double") /
          count(lit(1))).as("avg_unit"),
        (count(lit(1)) * 2).as("n2"),
        (max(col("o_totalprice")) - min(col("o_totalprice"))).as("range"))
    val exact = exprQ.collect().map(_.toSeq).toSet
    RollupRegistry.register(spark, factPath,
      dims = Seq("o_orderstatus", "o_orderpriority"),
      measures = Seq("o_totalprice"))
    try {
      val p = planOf(exprQ)
      assert(p.contains("_cnt") && p.contains("_min_"), p)
      assert(exprQ.collect().map(_.toSeq).toSet == exact,
        "expression outputs drifted off the fact scan")
      // the CUBE path takes expression outputs too
      def cubeExpr = spark.read.parquet(factPath)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg((max(col("o_totalprice")) - min(col("o_totalprice"))).as("r"))
      val exactCube = {
        spark.conf.set(RollupRewriteRule.ConfKey, "false")
        try cubeExpr.collect().map(_.toSeq).toSet
        finally spark.conf.set(RollupRewriteRule.ConfKey, "true")
      }
      assert(planOf(cubeExpr).contains("_min_"))
      assert(cubeExpr.collect().map(_.toSeq).toSet == exactCube)
      // a NONDETERMINISTIC wrapper must decline — it may not ride an
      // "exact" rewrite even though the embedded aggregate could
      val jittered = spark.read.parquet(factPath)
        .groupBy(col("o_orderstatus"))
        .agg((count(lit(1)) + (rand(7) * 0)).as("n"))
      assert(!planOf(jittered).contains("_cnt"))
      // DISTINCT navigation falls out: a dims-only distinct is an
      // aggregate with no functions, served from the rollup's cells
      val dist = spark.read.parquet(factPath)
        .select("o_orderstatus").distinct()
      assert(planOf(dist).contains("graft-rollup"), planOf(dist))
      assert(dist.collect().map(_.getString(0)).sorted.toSeq ==
        Seq("F", "O", "P"))
    } finally RollupRegistry.clear()
  }

  test("avg over a NULL-bearing measure divides by the non-null count (r16 review)") {
    // Spark's Average ignores nulls; a rewrite dividing by the group
    // size (_cnt) would silently shrink the average — the rollup stores
    // the per-measure non-null count (_cntm_<m>) for exactly this
    RollupRegistry.clear()
    val dir = scratchDir("graft_rollup_nullavg")
    import spark.implicits._
    Seq(("A", Some(1.0)), ("A", None), ("A", Some(3.0)), ("A", None),
        ("B", Some(5.0)), ("B", None))
      .toDF("k", "m").write.mode("overwrite").parquet(dir)
    def q = spark.read.parquet(dir).groupBy(col("k"))
      .agg(avg(col("m").cast(DecimalType(18, 3))).as("a"),
        min(col("m")).as("mn"), count(lit(1)).as("n"))
    val exact = q.collect().map(_.toSeq).toSet // avg(A)=2.0 over 2, not 4
    RollupRegistry.register(spark, dir, dims = Seq("k"), measures = Seq("m"))
    try {
      val p = planOf(q)
      assert(p.contains("_cntm_m"), p)
      assert(q.collect().map(_.toSeq).toSet == exact,
        "null-bearing avg drifted off the fact scan (divided by _cnt?)")
    } finally RollupRegistry.clear()
  }

  test("kill switch and non-matching shapes keep the fact scan") {
    RollupRegistry.clear()
    RollupRegistry.register(spark, factPath,
      dims = Seq("o_orderstatus", "o_orderpriority"),
      measures = Seq("o_totalprice"))
    try {
      spark.conf.set(RollupRewriteRule.ConfKey, "false")
      assert(!planOf(naive).contains("_cnt"))
      spark.conf.set(RollupRewriteRule.ConfKey, "true")
      // raw double sum is not re-aggregable from partials: no match
      val rawSum = spark.read.parquet(factPath)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("o_totalprice")).as("t"))
      assert(!planOf(rawSum).contains("_cnt"))
      // grouping on a non-dim column: no match
      val badDim = spark.read.parquet(factPath)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      assert(!planOf(badDim).contains("_cnt"))
      // filter on a non-dim column: no match
      val badFilter = spark.read.parquet(factPath)
        .filter(col("o_custkey") < 100)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      assert(!planOf(badFilter).contains("_cnt"))
      // distinct aggregate: no match
      val dist = spark.read.parquet(factPath)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_orderpriority")).as("d"))
      assert(!planOf(dist).contains("_cnt"))
    } finally {
      spark.conf.set(RollupRewriteRule.ConfKey, "true")
      RollupRegistry.clear()
    }
  }

  test("edge gates: ungrouped empty count, count(NULL), nondeterministic filter") {
    RollupRegistry.clear()
    RollupRegistry.register(spark, factPath,
      dims = Seq("o_orderstatus", "o_orderpriority"),
      measures = Seq("o_totalprice"))
    try {
      // UNGROUPED count over an empty dim selection: fact answer is 0;
      // the rewritten Sum(_cnt) is NULL without the coalesce guard
      val emptySel = spark.read.parquet(factPath)
        .filter(col("o_orderstatus") === "ZZ-ABSENT")
        .agg(count(lit(1)).as("n"))
      assert(planOf(emptySel).contains("_cnt"), planOf(emptySel)) // it rewrites...
      assert(emptySel.collect().head.getLong(0) == 0L)            // ...and is exact
      // count(NULL) counts zero rows — must NOT become the group size.
      // Spark folds count(lit(null)) to 0 before the rule fires, so the
      // remaining plan (distinct groups + literal 0) may legitimately
      // ride the rollup's cells (r16 expression outputs) — the VALUE is
      // the fence; rewriteAggFn itself still declines a null-literal
      // Count in any unfolded spelling
      val countNull = spark.read.parquet(factPath)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(null)).as("n"))
      assert(countNull.collect().forall(_.getLong(1) == 0L))
      // nondeterministic reference-free conjunct (sampling): evaluating
      // it per rollup CELL instead of per fact row changes semantics —
      // the determinism gate must keep the fact scan
      val sampled = spark.read.parquet(factPath)
        .filter(rand(7) < 0.5)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      assert(!planOf(sampled).contains("_cnt"), planOf(sampled))
    } finally RollupRegistry.clear()
  }

  test("CUBE/ROLLUP ride the rollup through the Expand, exactly") {
    RollupRegistry.clear()
    def cubeQ = spark.read.parquet(factPath)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 3))).cast("double")
          .as("total"))
    def rollupQ = spark.read.parquet(factPath)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .rollup(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val cubeExact = cubeQ.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val rollupExact = rollupQ.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    RollupRegistry.register(spark, factPath,
      dims = Seq("o_orderstatus", "o_orderpriority"),
      measures = Seq("o_totalprice"))
    try {
      val pc = planOf(cubeQ)
      assert(pc.contains("_cnt"), pc)      // the Expand reads rollup cells
      assert(pc.contains("Expand"), pc)    // grouping-set skeleton intact
      assert(!pc.contains("o_custkey"), pc)
      assert(cubeQ.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap == cubeExact)
      // dim-only filter remaps below the rebuilt Expand
      val pr = planOf(rollupQ)
      assert(pr.contains("_cnt"), pr)
      assert(rollupQ.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == rollupExact)
    } finally RollupRegistry.clear()
  }

  test("grouping-sets fences: duplicate-sensitive aggs and non-dim sets keep the fact") {
    RollupRegistry.clear()
    RollupRegistry.register(spark, factPath,
      dims = Seq("o_orderstatus", "o_orderpriority"),
      measures = Seq("o_totalprice"))
    try {
      // avg over cells != avg over rows: must NOT rewrite
      val avgQ = spark.read.parquet(factPath)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(avg(col("o_totalprice")).as("a"))
      assert(!planOf(avgQ).contains("_cnt"), planOf(avgQ))
      // a non-dim column in the cube: must NOT rewrite
      val badDim = spark.read.parquet(factPath)
        .cube(col("o_orderstatus"), col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      assert(!planOf(badDim).contains("_cnt"), planOf(badDim))
      // non-dim filter below the cube: must NOT rewrite
      val badFilter = spark.read.parquet(factPath)
        .filter(col("o_custkey") < 100)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(!planOf(badFilter).contains("_cnt"), planOf(badFilter))
      // kill switch applies to the grouping-sets path too
      spark.conf.set(RollupRewriteRule.ConfKey, "false")
      val cubeQ = spark.read.parquet(factPath)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(!planOf(cubeQ).contains("_cnt"))
    } finally {
      spark.conf.set(RollupRewriteRule.ConfKey, "true")
      RollupRegistry.clear()
    }
  }

  test("in-place fact rewrite WITHOUT re-register falls back to the fact scan (serve-time guard)") {
    // the r14 gap (VERDICT ask #2): register() keys the ARTIFACT on the
    // fact signature, but serving used to check only the path — a fact
    // rewritten in place silently re-aggregated the old cells while the
    // rule claimed exactness. lookupFresh re-checks the signature at
    // serve time (TTL-cached; 0 here = every serve) and deregisters on
    // drift, so the aggregation keeps its exact fact scan.
    RollupRegistry.clear()
    val dir = scratchDir("graft_rollup_inplace")
    import spark.implicits._
    Seq(("A", 1.0), ("B", 2.0)).toDF("k", "m")
      .write.mode("overwrite").parquet(dir)
    def q = spark.read.parquet(dir).groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
    RollupRegistry.register(spark, dir, dims = Seq("k"), measures = Seq("m"))
    spark.conf.set(RollupRewriteRule.StaleCheckMsKey, "0")
    try {
      assert(planOf(q).contains("_cnt"))
      // rewrite the fact in place, NO re-register
      Seq(("A", 9.0), ("A", 8.0), ("C", 7.0)).toDF("k", "m")
        .write.mode("overwrite").parquet(dir)
      assert(!planOf(q).contains("_cnt"),
        "stale rollup cells served after an in-place fact rewrite")
      assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == Map("A" -> 2L, "C" -> 1L))
      assert(RollupRegistry.lookup(dir).isEmpty,
        "drifted registration must deregister")
    } finally {
      spark.conf.unset(RollupRewriteRule.StaleCheckMsKey)
      RollupRegistry.clear()
    }
  }

  test("a fresh session rehydrates the persisted rollup registration; deregister revokes durably") {
    // the ANN registry's r15 durability, applied here: register persists
    // a record inside the rollup dir, a fresh session's matching
    // GROUP BY rehydrates it (validated against the LIVE fact signature)
    // instead of requiring a re-register; deregister deletes the record
    // so an explicit revocation cannot resurrect
    RollupRegistry.clear()
    val dir = scratchDir("graft_rollup_rehydrate")
    import spark.implicits._
    Seq(("A", 1.0), ("A", 2.0), ("B", 3.0)).toDF("k", "m")
      .write.mode("overwrite").parquet(dir)
    def q = spark.read.parquet(dir).groupBy(col("k"))
      .agg(sum(col("m").cast(DecimalType(18, 3))).cast("double").as("t"))
    val entry =
      RollupRegistry.register(spark, dir, dims = Seq("k"), measures = Seq("m"))
    try {
      assert(planOf(q).contains("_sum_m"))
      // "fresh session": JVM registry gone, the persisted record survives
      RollupRegistry.clear()
      assert(RollupRegistry.lookup(dir).isEmpty)
      assert(planOf(q).contains("_sum_m"),
        "matching aggregate must rehydrate the persisted registration")
      assert(q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        == Map("A" -> 3.0, "B" -> 3.0))
      assert(RollupRegistry.lookup(dir).isDefined)
      // durable revocation
      RollupRegistry.deregister(dir)
      assert(!planOf(q).contains("_sum_m"),
        "deregistered fact must keep its exact scan (record not revoked?)")
      // r17: revocation renames the record to the REVOKED marker instead
      // of deleting it — the dir stays OURS for gc (a deleted record made
      // every deregistered dir a foreign orphan the sweep kept forever)
      val d = new java.io.File(entry.rollupPath)
      assert(!new java.io.File(d, "_rollup_registration.txt").isFile)
      assert(new java.io.File(d, "_rollup_registration.revoked").isFile,
        "deregister must leave the revoked marker")
      val swept = RollupRegistry.gc(olderThanMs = 0L)
      assert(swept.contains(entry.rollupPath),
        s"gc must reclaim the revoked dir, got $swept")
      assert(!d.exists())
    } finally {
      RollupRegistry.deregister(dir)
      RollupRegistry.clear()
    }
  }

  test("changed fact data at the same path rebuilds the rollup (no stale serve)") {
    RollupRegistry.clear()
    val dir = scratchDir("graft_rollup_stale")
    import spark.implicits._
    Seq(("A", 1.0), ("A", 2.0), ("B", 3.0)).toDF("k", "m")
      .write.mode("overwrite").parquet(dir)
    def q = spark.read.parquet(dir).groupBy(col("k"))
      .agg(sum(col("m").cast(DecimalType(18, 3))).cast("double").as("t"))
    RollupRegistry.register(spark, dir, dims = Seq("k"), measures = Seq("m"))
    try {
      assert(planOf(q).contains("_sum_m"))
      assert(q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        == Map("A" -> 3.0, "B" -> 3.0))
      // overwrite the fact: a re-register must key on the NEW file
      // signature and rebuild, not serve the stale cells
      Seq(("A", 10.0), ("C", 5.0)).toDF("k", "m")
        .write.mode("overwrite").parquet(dir)
      RollupRegistry.register(spark, dir, dims = Seq("k"), measures = Seq("m"))
      assert(q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        == Map("A" -> 10.0, "C" -> 5.0))
    } finally RollupRegistry.clear()
  }

  test("gc reclaims superseded rollup dirs; live registrations and recordless dirs survive (r15 ask #4)") {
    RollupRegistry.clear()
    val dir = scratchDir("graft_rollup_gc_fact")
    val root = scratchDir("graft_rollup_gc_root")
    import spark.implicits._
    Seq(("A", 1.0), ("B", 3.0)).toDF("k", "m")
      .write.mode("overwrite").parquet(dir)
    val e1 = RollupRegistry.register(spark, dir,
      dims = Seq("k"), measures = Seq("m"), cacheRoot = root)
    try {
      // supersede: grow the fact, re-register — a NEW dir appears and
      // the old one keeps its (now signature-stale) record
      Seq(("C", 5.0)).toDF("k", "m").write.mode("append").parquet(dir)
      val e2 = RollupRegistry.register(spark, dir,
        dims = Seq("k"), measures = Seq("m"), cacheRoot = root)
      assert(e2.rollupPath != e1.rollupPath)
      // a recordless dir in the root is not ours to judge — kept
      val foreign = new java.io.File(root, "rollup_feedfeed")
      foreign.mkdirs()
      // age bar: dirs younger than olderThanMs survive even when stale
      assert(RollupRegistry.gc(root, olderThanMs = 3600000L,
        keep = RollupRegistry.livePaths).isEmpty)
      val swept = RollupRegistry.gc(root, olderThanMs = 0L,
        keep = RollupRegistry.livePaths)
      assert(swept == Seq(e1.rollupPath),
        s"expected exactly the superseded dir, got $swept")
      assert(!new java.io.File(e1.rollupPath).exists())
      assert(new java.io.File(s"${e2.rollupPath}/_SUCCESS").isFile,
        "live registration's dir reclaimed")
      assert(foreign.isDirectory, "recordless dir reclaimed")
      // the live dir still serves after the sweep
      def q = spark.read.parquet(dir).groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
      assert(planOf(q).contains("_cnt"))
      assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == Map("A" -> 1L, "B" -> 1L, "C" -> 1L))
    } finally RollupRegistry.clear()
  }

  test("multiple rollups per fact: both serve, the most aggregated matching shape wins; stale siblings revoke (r17)") {
    RollupRegistry.clear()
    val dir = scratchDir("graft_rollup_multi_fact")
    import spark.implicits._
    Seq(("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 3.0), ("B", "y", 4.0),
      ("B", "y", 6.0)).toDF("k1", "k2", "m")
      .write.mode("overwrite").parquet(dir)
    def q(d: String) = spark.read.parquet(dir).groupBy(col(d))
      .agg(count(lit(1)).as("n"),
        sum(col("m").cast(DecimalType(18, 3))).cast("double").as("t"))
    try {
      RollupRegistry.register(spark, dir, dims = Seq("k1", "k2"),
        measures = Seq("m"))
      RollupRegistry.register(spark, dir, dims = Seq("k2"),
        measures = Seq("m"))
      assert(RollupRegistry.lookupAll(dir).size == 2,
        "the second shape must not replace the first")
      // GROUP BY k1: only the wide shape can serve (k1 not in narrow)
      val p1 = planOf(q("k1"))
      assert(p1.contains("_sum_m") && p1.contains("k1#"), p1)
      assert(q("k1").collect().map(r => r.getString(0) -> r.getDouble(2))
        .toMap == Map("A" -> 3.0, "B" -> 13.0))
      // GROUP BY k2: both match; the NARROW shape (fewest dims, fewest
      // cells) must win — its relation carries no k1 column
      val p2 = planOf(q("k2"))
      assert(p2.contains("_sum_m") && !p2.contains("k1#"),
        s"groupBy(k2) must serve from the k2-only rollup:\n$p2")
      assert(q("k2").collect().map(r => r.getString(0) -> r.getDouble(2))
        .toMap == Map("x" -> 4.0, "y" -> 12.0))
      // CUBE over k2 rides the narrow shape through the Expand too
      val pc = planOf(spark.read.parquet(dir).cube(col("k2"))
        .agg(count(lit(1)).as("n")))
      assert(pc.contains("_cnt") && !pc.contains("k1#"), pc)
      // a fresh session rehydrates BOTH shapes from their records
      RollupRegistry.clear()
      assert(planOf(q("k1")).contains("_sum_m"),
        "wide shape must rehydrate")
      assert(RollupRegistry.lookupAll(dir).size == 2,
        "rehydration must restore every registered shape")
      // fact changes; re-registering ONE shape revokes the stale sibling
      Seq(("C", "x", 9.0)).toDF("k1", "k2", "m")
        .write.mode("append").parquet(dir)
      RollupRegistry.register(spark, dir, dims = Seq("k2"),
        measures = Seq("m"))
      val left = RollupRegistry.lookupAll(dir)
      assert(left.map(_.dims) == Seq(Seq("k2")),
        s"stale wide sibling must be revoked, got ${left.map(_.dims)}")
      assert(!planOf(q("k1")).contains("_sum_m"),
        "revoked stale shape must not serve")
      assert(q("k1").collect().map(r => r.getString(0) -> r.getDouble(2))
        .toMap == Map("A" -> 3.0, "B" -> 13.0, "C" -> 9.0))
      assert(planOf(q("k2")).contains("_sum_m"),
        "the re-registered shape serves the appended fact")
      assert(q("k2").collect().map(r => r.getString(0) -> r.getDouble(2))
        .toMap == Map("x" -> 13.0, "y" -> 12.0))
    } finally {
      RollupRegistry.deregister(dir)
      RollupRegistry.gc(olderThanMs = 0L)
      RollupRegistry.clear()
    }
  }

  test("insert-only refresh is O(delta): delta-merged cells value-equal a from-scratch build (r16 ask #1)") {
    RollupRegistry.clear()
    val dir = scratchDir("graft_rollup_incr_fact")
    val root = scratchDir("graft_rollup_incr_root")
    import spark.implicits._
    // nulls in the measure (the _cntm_/_min_/_max_ null-skip fold) and a
    // dim that only appears in the delta (cells born by the merge)
    Seq(("A", Some(1.5)), ("A", None), ("B", Some(3.0)))
      .toDF("k", "m").write.mode("overwrite").parquet(dir)
    RollupRegistry.register(spark, dir,
      dims = Seq("k"), measures = Seq("m"), cacheRoot = root)
    assert(RollupRegistry.lastBuildKind == "full")
    try {
      // insert-only wave: APPEND adds files, never touches existing ones
      Seq(("A", Some(10.0)), ("C", None), ("C", Some(-2.0)))
        .toDF("k", "m").write.mode("append").parquet(dir)
      val e2 = RollupRegistry.register(spark, dir,
        dims = Seq("k"), measures = Seq("m"), cacheRoot = root)
      assert(RollupRegistry.lastBuildKind == "incremental",
        "an appended fact must take the delta-merge path")
      val merged = spark.read.parquet(e2.rollupPath)
        .collect().map(_.toSeq).toSet
      // from-scratch reference: wipe the root so no delta base exists
      RollupRegistry.clear()
      Option(new java.io.File(root).listFiles()).foreach(_.foreach { d =>
        def del(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(del)); f.delete()
        }
        del(d)
      })
      val eFull = RollupRegistry.register(spark, dir,
        dims = Seq("k"), measures = Seq("m"), cacheRoot = root)
      assert(RollupRegistry.lastBuildKind == "full")
      val scratch = spark.read.parquet(eFull.rollupPath)
        .collect().map(_.toSeq).toSet
      assert(merged == scratch,
        s"delta-merged cells drifted off the from-scratch build:\n$merged\nvs\n$scratch")
      // and the merged cells SERVE exactly: count/sum/min/max/avg vs the
      // fact scan (rule off)
      def q = spark.read.parquet(dir).groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("m").cast(DecimalType(18, 3))).cast("double").as("t"),
          min(col("m")).as("mn"), max(col("m")).as("mx"),
          avg(col("m").cast(DecimalType(18, 3))).as("av"))
      val served = q.collect().map(_.toSeq).toSet
      spark.conf.set(RollupRewriteRule.ConfKey, "false")
      val exact =
        try q.collect().map(_.toSeq).toSet
        finally spark.conf.unset(RollupRewriteRule.ConfKey)
      assert(served == exact)
      // an UPDATE wave (existing file rewritten) must refuse the merge:
      // min/max cannot retract — full rebuild
      Seq(("A", Some(0.25)), ("B", Some(99.0)))
        .toDF("k", "m").write.mode("overwrite").parquet(dir)
      RollupRegistry.register(spark, dir,
        dims = Seq("k"), measures = Seq("m"), cacheRoot = root)
      assert(RollupRegistry.lastBuildKind == "full",
        "an overwritten fact must NOT delta-merge")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
        == Map("A" -> 1L, "B" -> 1L))
    } finally RollupRegistry.clear()
  }

  test("remote-scheme facts are staleness-guarded via the bounded listing; gc keeps the live remote fact (r16 ask #3 + ADVICE)") {
    // the pre-r17 guard signed any non-file scheme "" (unguarded) and
    // gc's java.io exists() probe read a live remote fact as missing;
    // the locality-aware resolver signs through the path's own
    // FileSystem — exercised here with a RawLocal-backed test scheme
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[graft.util.GraftTestFs].getName)
    RollupRegistry.clear()
    val local = scratchDir("graft_rollup_remote_fact")
    val root = scratchDir("graft_rollup_remote_root")
    val remote = s"graftfs:$local"
    import spark.implicits._
    Seq(("A", 1.0), ("A", 2.0), ("B", 3.0)).toDF("k", "m")
      .write.mode("overwrite").parquet(remote)
    val e = RollupRegistry.register(spark, remote,
      dims = Seq("k"), measures = Seq("m"), cacheRoot = root)
    spark.conf.set(RollupRewriteRule.StaleCheckMsKey, "0")
    try {
      assert(e.sourceSig.startsWith("h1:"),
        s"remote scheme must carry the listing signature, got '${e.sourceSig}'")
      def q = spark.read.parquet(remote).groupBy(col("k"))
        .agg(sum(col("m").cast(DecimalType(18, 3))).cast("double").as("t"))
      assert(planOf(q).contains("_sum_m"),
        "guarded remote registration must serve the rewrite")
      assert(q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        == Map("A" -> 3.0, "B" -> 3.0))
      // gc with the fact LIVE and unchanged: nothing reclaimable — the
      // ADVICE scenario was exactly this dir being swept as "missing"
      assert(RollupRegistry.gc(root, olderThanMs = 0L,
        keep = Set.empty).isEmpty,
        "gc reclaimed a live remote fact's current rollup")
      // remote fact changes (append through the scheme): serve-time
      // re-check deregisters, the aggregation keeps its exact scan
      Seq(("C", 9.0)).toDF("k", "m").write.mode("append").parquet(remote)
      assert(!planOf(q).contains("_sum_m"),
        "stale remote cells served after the fact changed")
      assert(q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        == Map("A" -> 3.0, "B" -> 3.0, "C" -> 9.0))
      // the refresh re-register takes the O(delta) merge over the SCHEME
      // (r17: the manifest records the remote listing's entries, so an
      // insert-only wave on object storage classifies as delta too)
      RollupRegistry.register(spark, remote,
        dims = Seq("k"), measures = Seq("m"), cacheRoot = root)
      assert(RollupRegistry.lastBuildKind == "incremental",
        "an appended remote fact must take the delta-merge path")
      assert(planOf(q).contains("_sum_m"))
      assert(q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        == Map("A" -> 3.0, "B" -> 3.0, "C" -> 9.0))
      // …and NOW the superseded dir is reclaimable (the refreshed dir is
      // current and survives the zero age bar)
      assert(RollupRegistry.gc(root, olderThanMs = 0L, keep = Set.empty)
        == Seq(e.rollupPath))
    } finally {
      spark.conf.unset(RollupRewriteRule.StaleCheckMsKey)
      RollupRegistry.clear()
    }
  }

  test("gc reaps a crashed builder's staging dir by dead pid; a live builder's survives (r16 ask #5)") {
    val root = scratchDir("graft_rollup_staging_root")
    // dead-pid staging leftover (pid 2 is never a JVM on this box —
    // kthreadd — and ProcessHandle.of sees only reachable processes)
    val crashed = new java.io.File(root, "rollup_deadbeef.build-999999999-42")
    crashed.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(crashed, "part-0.parquet").toPath, Array[Byte](1))
    // live-pid staging dir: never touched
    val alive = new java.io.File(root,
      s"rollup_cafebabe.build-${ProcessHandle.current().pid()}-7")
    alive.mkdirs()
    val swept = RollupRegistry.gc(root, olderThanMs = 3600000L)
    assert(swept == Seq(crashed.getPath), s"got $swept")
    assert(!crashed.exists())
    assert(alive.isDirectory, "live builder's staging dir reclaimed")
  }
}

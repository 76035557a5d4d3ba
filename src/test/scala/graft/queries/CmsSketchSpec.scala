package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** CMS estimates have no cross-engine oracle (hash-layout-specific);
  * pin the sketch guarantees against the exact counts instead, same
  * policy as ApproxDistinctSpec for HLL/GK. */
class CmsSketchSpec extends AnyFunSuite with SparkTestBase {

  test("count-min estimates are overestimates within the N/W error bound") {
    val rows = ScaleQueries.cmsHeavyHittersFull(spark, sf0_001)
      .orderBy(org.apache.spark.sql.functions.col("est_n").desc,
        org.apache.spark.sql.functions.col("user_id"))
      .limit(20).collect()
    assert(rows.nonEmpty)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val n = spark.read.parquet(s"$sf0_001/events.parquet").count()
    val w = 512
    rows.foreach { r =>
      val (est, exact, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // CMS never undercounts...
      assert(est >= exact, s"user ${r.getLong(0)}: est $est < exact $exact")
      assert(over == est - exact)
      // ...and the min-over-D overcount stays within a few expected
      // bucket collisions (E[overcount per row] = N/W per hash; min
      // over D=4 independent hashes is far tighter — 4x slack keeps
      // the test data-robust without losing the scale property: the
      // bound shrinks relative to heavy-hitter counts as W grows).
      assert(over <= 4 * n / w,
        s"user ${r.getLong(0)}: overcount $over > ${4 * n / w} (N=$n, W=$w)")
    }
  }

  test("cms top-20 ranking matches exact ranking on distinctly-heavy keys") {
    val byEst = ScaleQueries.cmsHeavyHittersFull(spark, sf0_001)
      .orderBy(org.apache.spark.sql.functions.col("est_n").desc,
        org.apache.spark.sql.functions.col("user_id"))
      .limit(20).collect().map(_.getLong(0))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val exactTop = spark.read.parquet(s"$sf0_001/events.parquet")
      .groupBy("user_id").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc,
        org.apache.spark.sql.functions.col("user_id"))
      .limit(20).collect().map(_.getLong(0))
    // overlap, not equality: near-tied keys may legitimately swap under
    // estimate noise, but the heavy-hitter SET must be recovered
    assert(byEst.toSet.intersect(exactTop.toSet).size >= 15,
      s"cms top-20 recovered only ${byEst.toSet.intersect(exactTop.toSet).size}/20 exact heavy hitters")
  }

  test("shard-merged sketch is cell-for-cell identical to the whole-corpus sketch") {
    import org.apache.spark.sql.functions._
    import graft.functions.CmsSignals
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = graft.QueryPack.loadEvents(spark, s"$sf0_001/events.parquet")
      .select(col("event_id"), col("user_id"))
    // 3-way split on a different modulus than the registered query uses,
    // so the law is pinned beyond the one sharding the oracle sees
    val shards = (0 until 3).map(i =>
      CmsSignals.sketch(e.filter(pmod(col("event_id"), lit(3)) === i), "user_id"))
    val merged = shards.reduce(CmsSignals.merge)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val whole = CmsSignals.sketch(e, "user_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == whole, "merged CMS differs from whole-corpus CMS")
    assert(whole.nonEmpty)
  }

  test("hll shard union estimate agrees with the direct-build estimate") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = graft.QueryPack.loadEvents(spark, s"$sf0_001/events.parquet")
      .select(col("event_id"), col("event_type"), col("user_id"))
    val direct = e.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val unioned = e.withColumn("shard", pmod(col("event_id"), lit(4)))
      .groupBy(col("event_type"), col("shard"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct.keySet == unioned.keySet)
    // union drops HIP for the composite estimator, so allow the documented
    // few-percent drift — but both estimates must describe the same set
    direct.foreach { case (k, d) =>
      val u = unioned(k)
      assert(math.abs(u - d) <= math.max(2L, (0.05 * d).toLong),
        s"$k: union est $u vs direct est $d")
    }
  }
}

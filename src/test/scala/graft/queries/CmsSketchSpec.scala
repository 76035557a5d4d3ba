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
}
